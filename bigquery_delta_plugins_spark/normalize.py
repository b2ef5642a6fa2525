"""BigQuery-compatible identifier normalization.

Pure-Python reimplementation of the normalization semantics in the
reference (BigQueryUtils.java:186-269):

- dataset names: only ``[A-Za-z0-9_]`` (Java ``\\w`` is ASCII), runs of
  invalid chars collapse to one ``_``, may start with a digit, max 1024.
- table names: Unicode categories L (letter), M (mark), N (number),
  Pc (connector punctuation, includes ``_``), Pd (dash), Zs (space);
  max 1024; may start with a digit.
- field names: by default same charset as dataset names, must NOT start
  with a digit (an ``_`` is prepended), max 300.  With *flexible column
  naming* the charset extends to ``& % + = : ' < > # |`` and space
  (BigQueryUtils.java:45-48).

Truncation happens last, after replacement and digit-prefix handling,
exactly as in the reference (BigQueryUtils.java:241-268).
"""

from __future__ import annotations

import functools
import re
import unicodedata

FIELD_NAME_MAX_LENGTH = 300
DATASET_OR_TABLE_NAME_MAX_LENGTH = 1024

_DATASET_INVALID_RUN = re.compile(r"[^A-Za-z0-9_]+")

# Unicode general categories allowed in BigQuery table names.
_TABLE_CATEGORIES = frozenset(
    {"Lu", "Ll", "Lt", "Lm", "Lo", "Mn", "Mc", "Me", "Nd", "Nl", "No", "Pc", "Pd", "Zs"}
)
_FLEX_EXTRA = frozenset("&%+=:'<>#| ")


def _table_char_ok(ch: str) -> bool:
    return unicodedata.category(ch) in _TABLE_CATEGORIES


def _flex_field_char_ok(ch: str) -> bool:
    return ch in _FLEX_EXTRA or unicodedata.category(ch) in _TABLE_CATEGORIES


def _replace_invalid_runs(name: str, ok) -> str:
    out: list[str] = []
    in_bad_run = False
    for ch in name:
        if ok(ch):
            out.append(ch)
            in_bad_run = False
        elif not in_bad_run:
            out.append("_")
            in_bad_run = True
    return "".join(out)


def _finish(name: str, can_start_with_number: bool, max_length: int) -> str:
    if not can_start_with_number and name and name[0].isdigit():
        name = "_" + name
    return name[:max_length]


@functools.lru_cache(maxsize=4096)
def normalize_dataset_name(name: str) -> str:
    """Normalize a dataset/database name (BigQueryUtils.java:202-210)."""
    if not name:
        return name
    name = _DATASET_INVALID_RUN.sub("_", name)
    return _finish(name, True, DATASET_OR_TABLE_NAME_MAX_LENGTH)


def get_normalized_dataset_name(dataset_name: str | None, database_name: str) -> str:
    """Prefer the configured dataset name; fall back to the source database
    name (BigQueryUtils.java:186-200)."""
    return normalize_dataset_name(dataset_name if dataset_name else database_name)


@functools.lru_cache(maxsize=4096)
def normalize_table_name(name: str) -> str:
    """Normalize a table name (BigQueryUtils.java:212-221)."""
    if not name:
        return name
    name = _replace_invalid_runs(name, _table_char_ok)
    return _finish(name, True, DATASET_OR_TABLE_NAME_MAX_LENGTH)


@functools.lru_cache(maxsize=65536)
def normalize_field_name(name: str, allow_flexible_column_naming: bool = False) -> str:
    """Normalize a column name (BigQueryUtils.java:223-235).

    Default mode uses the ASCII word charset; flexible mode the extended
    charset. A leading digit gets an underscore prepended; max 300 chars.
    """
    if not name:
        return name
    if allow_flexible_column_naming:
        name = _replace_invalid_runs(name, _flex_field_char_ok)
    else:
        name = _DATASET_INVALID_RUN.sub("_", name)
    return _finish(name, False, FIELD_NAME_MAX_LENGTH)


def normalize_columns(df, allow_flexible_column_naming: bool = False):
    """Rename every column of ``df`` to its normalized form.

    Spark-side equivalent of the reference's per-event schema mapping
    (BigQueryUtils.java:271-330, SchemaMappingCache.java:26-70) — applied
    once per DataFrame instead of once per row; Catalyst makes the rename
    a zero-cost projection.
    """
    mapping = {
        c: normalize_field_name(c, allow_flexible_column_naming) for c in df.columns
    }
    if all(k == v for k, v in mapping.items()):
        return df
    return df.withColumnsRenamed(mapping)
