"""Sources: table loading (Iceberg catalog / parquet), the deterministic
synthetic token-table generator, and the checkpoint manifest store."""

from .manifest import FileManifestStore, ManifestRecord
from .tables import load_table
from .token_table import SOURCES, VOCAB_SIZE, source_dim, token_table

__all__ = [
    "FileManifestStore",
    "ManifestRecord",
    "load_table",
    "SOURCES",
    "VOCAB_SIZE",
    "source_dim",
    "token_table",
]
