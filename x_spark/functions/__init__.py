"""Column-level helper functions (portable hashing, vectors, text)."""
