"""Vector similarity / dedup catalog (populated in Phase 3)."""
