"""Recall audit for the approximate similarity paths (VERDICT r2 #6).

The scale paths (sign-LSH ANN, IVF ANN, banded cosine pairs) trade
recall for candidate-restricted joins; the exact baselines
(ann_topk_bruteforce, cosine_pairs) exist precisely to audit them.
This module MEASURES that trade on the same corpus the driver queries
run on, so the claim "audit vs brute force" is a number, not a promise:

- ``recall@k`` per query = |approx top-k ∩ exact top-k| / k, averaged
  over the query set (the standard ANN-benchmarks definition).
- pair recall = |banded pairs ∩ exact pairs| / |exact pairs| at the
  same cosine threshold (banded results are exact cosines, so there are
  no false positives — recall is the only loss axis).

All result sets are tiny (top-k per query / threshold-filtered pairs),
so the set arithmetic runs driver-side on collected rows.
``tools/recall_report.py`` prints the report as one JSON line;
``tests/test_dedup_hygiene.py`` pins the floors.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import pipeline_queries as PQ


def _topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.select("query_id", "neighbor_id").collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _pair_set(df) -> set[tuple[int, int]]:
    return {(r["id_a"], r["id_b"]) for r in df.select("id_a", "id_b").collect()}


def recall_report(spark: SparkSession, sf_dir: str) -> dict:
    """Recall of every approximate similarity path vs its exact baseline
    at the driver-query parameters (pipeline_queries constants)."""
    exact = _topk_sets(PQ.ann_topk_bruteforce(spark, sf_dir))

    def recall_at_k(approx_df) -> float:
        approx = _topk_sets(approx_df)
        per_q = [
            len(approx.get(q, set()) & want) / len(want)
            for q, want in exact.items()
            if want
        ]
        return round(sum(per_q) / len(per_q), 4) if per_q else 1.0

    lsh = recall_at_k(PQ.ann_topk_lsh(spark, sf_dir))
    ivf = recall_at_k(PQ.ann_topk_ivf(spark, sf_dir))

    from ..operators.similarity import cosine_pairs

    exact_pairs = _pair_set(
        cosine_pairs(
            PQ._embs(spark, sf_dir), "vec_id", "embedding",
            threshold=PQ.COSINE_THRESHOLD, dim=PQ.EMBED_DIM,
        )
    )
    banded_pairs = _pair_set(PQ.embed_cosine_neardup(spark, sf_dir))
    assert banded_pairs <= exact_pairs, (
        "banded cosine produced a pair the exact baseline lacks — "
        "cosine arithmetic diverged"
    )
    pair_recall = (
        round(len(banded_pairs) / len(exact_pairs), 4) if exact_pairs else 1.0
    )
    return {
        "sf_dir": sf_dir,
        "ann_lsh_recall_at_k": lsh,
        "ann_ivf_recall_at_k": ivf,
        "cosine_banded_pair_recall": pair_recall,
        "n_queries": len(exact),
        "k": PQ.ANN_K,
        "n_exact_pairs": len(exact_pairs),
        "n_banded_pairs": len(banded_pairs),
        "params": {
            "ann_planes": PQ.ANN_PLANES,
            "ann_tables": PQ.ANN_TABLES,
            "ivf_cells": PQ.IVF_CELLS,
            "ivf_nprobe": PQ.IVF_NPROBE,
            "neardup_planes": PQ.NEARDUP_PLANES,
            "neardup_tables": PQ.NEARDUP_TABLES,
            "cosine_threshold": PQ.COSINE_THRESHOLD,
        },
    }
