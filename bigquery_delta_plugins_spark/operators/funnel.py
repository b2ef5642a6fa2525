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
    # Only FUNNEL-STEP events enter the aggregation buffer:
    # ``collect_list`` skips NULLs, so wrapping the struct in a
    # ``when(step isin steps)`` guard keeps every user in the groupBy
    # (all-non-step users still land in the depth-0 bucket) while the
    # per-user buffer shrinks from ALL of the user's events to just the
    # funnel-step ones — a bot user with 10M non-step events no longer
    # materializes a 10M-element array in one aggregation buffer.
    # Result-identical: non-step events can never advance the fold
    # (their ``s`` never equals ``step_arr[acc]``), and dropping them
    # preserves the relative ``order_col`` order of the step events.
    seq = F.transform(
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col(step_col).isin(steps),
                    F.struct(F.col(order_col).alias("o"),
                             F.col(step_col).alias("s")),
                )
            )
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
