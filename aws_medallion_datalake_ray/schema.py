"""Canonical schemas for the engine.

The engine's one true input shape (per BASELINE.json ``input_hint``) is a
Parquet table of source-code repositories; the reference's bronze layer is
stringly-typed rows with lineage metadata (cf. reference
``scripts/bronze_digit.py:131-139`` stringify-normalizer and ``:84-90``
metadata enrichment), silver is the typed/cleaned projection
(``scripts/silver_digit_clean.py:69-116``).
"""

from __future__ import annotations

import pyarrow as pa

# Canonical input table: one row = one file version in a source-code repo.
# ``content`` uses large_string so a single block never overflows 2 GiB
# Arrow string offsets at 100 TB scale.
SOURCE_FILES_SCHEMA = pa.schema(
    [
        pa.field("repo", pa.string()),
        pa.field("path", pa.string()),
        pa.field("commit", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("content", pa.large_string()),
    ]
)

# The engine-derived invariant columns (computed at silver promotion, never
# stored in the raw input): content_sha256 is the per-row verification
# invariant for all maintenance ops; size_bytes feeds compaction planning.
SILVER_SOURCE_FILES_SCHEMA = pa.schema(
    [
        pa.field("repo", pa.string()),
        pa.field("path", pa.string()),
        pa.field("commit", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("content", pa.large_string()),
        pa.field("content_sha256", pa.string()),
        pa.field("size_bytes", pa.int64()),
    ]
)

# Primary key for MERGE INTO / dedup (per BASELINE.json north_rule).
SOURCE_FILES_KEY = ("repo", "path", "commit")

# Columns for which the manifest keeps per-file min/max/null stats by
# default.  ``content`` is deliberately excluded: min/max of a large_string
# column is useless for pruning and bloats the manifest.
DEFAULT_STATS_COLS = ("repo", "path", "commit", "lang", "size_bytes")

LANGS = ("py", "rs", "go", "js", "ts", "java", "c", "cpp", "md", "toml")
