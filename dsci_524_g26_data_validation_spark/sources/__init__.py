"""Sources: table loading (Iceberg catalog / parquet), the deterministic
synthetic token-table generator, and the checkpoint manifest store."""

from .manifest import FileManifestStore, ManifestRecord
from .tables import (
    CONTRACT_PROPERTY,
    load_contract,
    load_table,
    store_contract,
    time_travel_options,
)
from .token_table import SOURCES, VOCAB_SIZE, source_dim, token_table

__all__ = [
    "FileManifestStore",
    "ManifestRecord",
    "CONTRACT_PROPERTY",
    "load_contract",
    "load_table",
    "store_contract",
    "time_travel_options",
    "SOURCES",
    "VOCAB_SIZE",
    "source_dim",
    "token_table",
]
