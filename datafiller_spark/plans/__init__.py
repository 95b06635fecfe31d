from .pipeline import run_pipeline, PipelineResult
from .checkpoint import read_high_water, write_high_water, incremental_filter

__all__ = [
    "run_pipeline",
    "PipelineResult",
    "read_high_water",
    "write_high_water",
    "incremental_filter",
]
