from .stream import streaming_rollup, start_rollup_stream

__all__ = ["streaming_rollup", "start_rollup_stream"]
