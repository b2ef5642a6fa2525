"""Mergeable KMV distinct-count sketch — streaming twin.

Batch twin: ``plans/pipeline_queries.py:events_kmv_cardinality`` (k
smallest md5-hash values per group, estimate ``(k-1)·2^32/(h_k+1)``).
K-min sets are mergeable — ``kmin_k(A ∪ B) = kmin_k(kmin_k(A) ∪
kmin_k(B))`` — which is exactly what a streaming distinct count needs:
per-group state is the bounded k-min array, each micro-batch merges its
new hashes in, and the running estimate is a pure function of the
state.  Order- and batching-independent by construction, so the final
streaming estimate is bit-identical to the batch sketch over the same
rows (pinned by ``tests/test_sketch.py``).

No reference counterpart (the reference's only aggregation is
MAX(_sequence_num), ``BigQueryUtils.java:150-159``); training-data
-pipeline scope — production ingest keeps per-metric cardinality
sketches per micro-batch exactly like this.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def kmv_estimate(mins: list, k: int) -> int:
    """Distinct-count estimate from a k-min set (ascending hash list).

    Exact-arithmetic twin of the batch query's Catalyst expression:
    below k observed values the set IS the count; at capacity the
    estimator is ``floor((k-1)·2^32/(h_k+1) + 0.5)`` — one
    correctly-rounded IEEE division, no libm."""
    if len(mins) < k:
        return len(mins)
    return int(math.floor((k - 1) * 4294967296.0 / (mins[k - 1] + 1) + 0.5))


def kmv_stream(
    events: DataFrame, group_col: str, hash_col: str, *, k: int = 64
) -> DataFrame:
    """Streaming KMV: maintain the per-group k-min hash set across
    micro-batches, emit one row per (group, batch) with the running
    estimate.  ``hash_col`` must be computed JVM-side upstream (e.g.
    ``functions.text.hash32``) so the stateful function only merges
    longs — no Python hashing in the hot path.  State is bounded at
    k longs per group; no timeout (the sketch never expires)."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("group", T.StringType()),
            T.StructField("n_batches", T.LongType()),
            T.StructField("kmv_estimate", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("mins", T.ArrayType(T.LongType())),
            T.StructField("n_batches", T.LongType()),
        ]
    )

    def update(key, pdf_iter, state: GroupState):
        mins, nb = state.get if state.exists else ([], 0)
        seen = set(mins)
        for pdf in pdf_iter:
            seen.update(int(x) for x in pdf[hash_col])
        mins = sorted(seen)[:k]
        nb += 1
        state.update((mins, nb))
        yield pd.DataFrame(
            {
                "group": [str(key[0])],
                "n_batches": [nb],
                "kmv_estimate": [kmv_estimate(mins, k)],
            }
        )

    return events.groupBy(group_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
