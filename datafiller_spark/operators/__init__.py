from .rollup import rollup, cascade, TIERS, tier_interval
from .bucket import time_bucket, regular_grid
from .gapfill import forward_fill, backward_fill, linear_fill, fill_small_gaps
from .impute import model_gapfill
from .encode import encode_tier, decode_tier

__all__ = [
    "rollup",
    "cascade",
    "TIERS",
    "tier_interval",
    "time_bucket",
    "regular_grid",
    "forward_fill",
    "backward_fill",
    "linear_fill",
    "fill_small_gaps",
    "model_gapfill",
    "encode_tier",
    "decode_tier",
]
