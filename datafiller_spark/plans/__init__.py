from .pipeline import (
    PipelineResult,
    apply_chunk_retention,
    apply_retention,
    latest_snapshot_id,
    read_snapshot,
    read_snapshots,
    run_pipeline,
    scan_chunks,
)
from .checkpoint import read_high_water, write_high_water, incremental_filter

__all__ = [
    "run_pipeline",
    "read_snapshot",
    "read_snapshots",
    "latest_snapshot_id",
    "apply_retention",
    "apply_chunk_retention",
    "scan_chunks",
    "PipelineResult",
    "read_high_water",
    "write_high_water",
    "incremental_filter",
]
