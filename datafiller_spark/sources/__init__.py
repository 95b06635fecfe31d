from .tables import load_table, tokenized_sequences, TOKEN_TIME_BASE
from .generator import synth_sequences
from .missing import add_contiguous_missing, add_mar, inject_contiguous_gaps, inject_mar

__all__ = [
    "load_table",
    "tokenized_sequences",
    "synth_sequences",
    "TOKEN_TIME_BASE",
    "add_mar",
    "add_contiguous_missing",
    "inject_mar",
    "inject_contiguous_gaps",
]
