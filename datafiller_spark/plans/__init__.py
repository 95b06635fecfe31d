from .pipeline import run_pipeline, read_snapshots, PipelineResult
from .checkpoint import read_high_water, write_high_water, incremental_filter

__all__ = [
    "run_pipeline",
    "read_snapshots",
    "PipelineResult",
    "read_high_water",
    "write_high_water",
    "incremental_filter",
]
