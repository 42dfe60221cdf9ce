"""Structured Streaming catalog (populated in Phase 4)."""
