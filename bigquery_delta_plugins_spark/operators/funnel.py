"""Ordered funnel analysis over an event stream.

"How many users did signup -> click -> purchase, in that order?" is the
canonical product-analytics query Spark has no native operator for
(MATCH_RECOGNIZE territory).  Greedy subsequence matching is the
standard semantics: a user reaches step k iff the first k step names
appear in their event sequence in order (earliest-match greediness is
provably sufficient for subsequence tests).

Implementation: one ``collect_list`` aggregation per user (single
shuffle, map-side partial), then a pure-Catalyst ``aggregate`` fold
advancing a step pointer over the time-ordered sequence — no window
functions, no self-joins, no Python.  Per-user state is the user's own
event list, so memory is bounded by the hottest user (the same bound
sessionization already carries).

The DuckDB oracle expresses the identical greedy semantics relationally
(chained earliest-match MIN aggregations), so the cross-check validates
the fold against an independent formulation, not a transliteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    user_col: str,
    order_col: str,
    step_col: str,
    steps: list[str],
) -> DataFrame:
    """Per funnel depth: how many users reached exactly that step count
    (0 .. len(steps)), matching steps as an ordered subsequence of the
    user's events sorted by ``order_col``."""
    if not steps:
        raise ValueError("steps must be non-empty")
    step_arr = F.array(*[F.lit(s) for s in steps])
    seq = F.transform(
        F.sort_array(
            F.collect_list(F.struct(F.col(order_col).alias("o"),
                                    F.col(step_col).alias("s")))
        ),
        lambda x: x["s"],
    )
    progress = F.aggregate(
        seq,
        F.lit(0),
        # F.get is 0-based and NULL-safe past the end (element_at would
        # raise under ANSI mode once acc == len(steps))
        lambda acc, s: F.when(s == F.get(step_arr, acc), acc + 1).otherwise(acc),
    )
    return (
        events.groupBy(F.col(user_col))
        .agg(progress.alias("steps_reached"))
        .groupBy("steps_reached")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
