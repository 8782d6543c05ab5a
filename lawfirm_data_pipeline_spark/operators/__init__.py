"""Engine operators: relation joins, mutation transforms, dedup,
similarity search, and text analysis."""
