"""Repo tooling (oracle checker, corpus generator)."""
