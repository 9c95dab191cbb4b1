from .transcripts import (  # noqa: F401
    TIERS,
    dims_dir,
    ensure_dims,
    ensure_tier,
    generate_transcripts,
    tier_dir,
    tier_for_sf_dir,
    transcripts_path,
)
