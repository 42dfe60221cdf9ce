"""Text-analysis / document-dedup catalog (populated in Phase 3)."""
