from .stanza import parse_stanza_text, read_stanza  # noqa: F401
from .attributes import parse_kv_attributes, read_tabular_attributes  # noqa: F401
from .fasta import FastaStore, SequenceSlice  # noqa: F401
