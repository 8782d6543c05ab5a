"""The reference's three pipeline stages as Spark batch transforms."""
