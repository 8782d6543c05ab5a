"""Headline analytic query plans, declared with the DataFrame API."""
