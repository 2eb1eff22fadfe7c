"""Structured Streaming: incremental validation of arriving pages."""
