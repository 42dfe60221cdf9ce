from .curated import (
    cleanse_eu,
    cleanse_ugc,
    curated_flow,
    derive_eu_raw,
    derive_ugc_raw,
    derive_verdicts,
    representative_map,
)

__all__ = [
    "cleanse_eu",
    "cleanse_ugc",
    "curated_flow",
    "derive_eu_raw",
    "derive_ugc_raw",
    "derive_verdicts",
    "representative_map",
]
