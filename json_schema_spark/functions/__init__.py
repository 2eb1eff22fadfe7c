"""Column-level function library: format checkers, hashing, text metrics."""
