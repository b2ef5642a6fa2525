"""Deterministic corpus splitting and sampling.

Training pipelines need splits that are (a) stable across reruns and
engines — no ``rand()``, which would break exactly-once reproducibility
and any oracle — and (b) assigned per document, so a document never
migrates between train and eval when the corpus grows.  Both follow
from hashing document identity into [0, 100) with the md5-derived
``hash32`` (the same construction any SQL engine reproduces; DuckDB has
no xxhash64, so the shared recipe stays md5).

No reference counterpart; part of the training-data-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash32


def split_bucket(identity: Column) -> Column:
    """Stable [0,100) bucket from a document-identity column."""
    return hash32(identity.cast("string")) % 100


def assign_split(
    identity: Column, val_pct: int = 1, test_pct: int = 1
) -> Column:
    """'train' / 'val' / 'test' assignment: the top ``test_pct`` buckets
    are test, the next ``val_pct`` val, the rest train.  Growing the
    corpus never reassigns an existing document."""
    b = split_bucket(identity)
    return (
        F.when(b >= 100 - test_pct, F.lit("test"))
        .when(b >= 100 - test_pct - val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )


def deterministic_sample(
    df: DataFrame, identity: Column, pct: int
) -> DataFrame:
    """Stable ``pct``% sample — same rows every run, any engine, no RNG
    state; scans stay prunable because the predicate is a pure column
    expression."""
    return df.filter(split_bucket(identity) < pct)
