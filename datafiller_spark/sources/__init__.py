from .tables import load_table, tokenized_sequences, TOKEN_TIME_BASE
from .generator import synth_sequences
from .datasets import (
    load_pems_bay,
    load_pems_bay_spark,
    load_titanic,
    load_titanic_spark,
)
from .missing import (
    add_contiguous_missing,
    add_mar,
    apply_mask,
    inject_contiguous_gaps,
    inject_mar,
    make_block_mask,
    make_mar_mask,
)

__all__ = [
    "load_table",
    "tokenized_sequences",
    "synth_sequences",
    "load_titanic",
    "load_titanic_spark",
    "load_pems_bay",
    "load_pems_bay_spark",
    "TOKEN_TIME_BASE",
    "add_mar",
    "add_contiguous_missing",
    "apply_mask",
    "inject_mar",
    "inject_contiguous_gaps",
    "make_block_mask",
    "make_mar_mask",
]
