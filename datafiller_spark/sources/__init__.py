from .tables import load_table, tokenized_sequences, TOKEN_TIME_BASE
from .generator import synth_sequences

__all__ = ["load_table", "tokenized_sequences", "synth_sequences", "TOKEN_TIME_BASE"]
