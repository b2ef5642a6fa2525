#!/usr/bin/env python
"""Recall/cost frontier sweep for the approximate similarity paths.

For each configuration of the LSH/IVF knobs, measures BOTH recall (vs
the exact baseline, computed once) and wall-clock (full query execution
to collect) on the given sf dir.  Output: one JSON line per config plus
a `best` summary — the cheapest config on each axis whose recall clears
the pinned floor (tests/test_dedup_hygiene.py, >= 0.6).

Usage:
    python tools/recall_sweep.py [sf_dir]      # default /root/testdata/sf0.1
Env:
    SPARK_GRAFT_CPUS (default 8), SPARK_GRAFT_SWEEP_REPEAT (default 2,
    wall = min over repeats — rejects one-off GC/JIT storms)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ANN_SWEEP = [  # (planes, tables)
    (4, 12),  # round-3 shipping point
    (4, 10), (4, 8), (4, 6),
    (5, 12), (5, 8),
    (3, 8), (3, 6), (3, 4),
]
NEARDUP_SWEEP = [  # (planes, tables)
    (4, 10),  # round-3 shipping point
    (4, 8), (4, 6), (4, 12),
    (5, 12), (3, 6), (3, 4),
]
IVF_SWEEP = [  # (cells, nprobe)
    (8, 4),   # round-3 shipping point
    (8, 2), (8, 3), (8, 5),
    (16, 4), (16, 6), (4, 2),
]
FLOOR = 0.6


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeat = int(os.environ.get("SPARK_GRAFT_SWEEP_REPEAT", "2"))
    from pyspark.sql import functions as F

    from bench import build_session
    from bigquery_delta_plugins_spark.operators import similarity as SIM
    from bigquery_delta_plugins_spark.plans import pipeline_queries as PQ
    from bigquery_delta_plugins_spark.plans.recall import _pair_set, _topk_sets

    spark = build_session(int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    try:
        e = PQ._embs(spark, sf_dir)
        e.cache().count()
        queries = e.filter(F.col("vec_id") < PQ.ANN_N_QUERIES)

        exact_topk = _topk_sets(PQ.ann_topk_bruteforce(spark, sf_dir))
        exact_pairs = _pair_set(
            SIM.cosine_pairs(
                e, "vec_id", "embedding",
                threshold=PQ.COSINE_THRESHOLD, dim=PQ.EMBED_DIM,
            )
        )

        def timed(build):
            walls, rows = [], None
            for _ in range(repeat):
                t0 = time.time()
                rows = build().collect()
                walls.append(round(time.time() - t0, 3))
            return rows, min(walls)

        def recall_at_k(rows) -> float:
            got: dict = {}
            for r in rows:
                got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            per_q = [
                len(got.get(q, set()) & want) / len(want)
                for q, want in exact_topk.items() if want
            ]
            return round(sum(per_q) / len(per_q), 4) if per_q else 1.0

        out = {"sf_dir": sf_dir, "repeat": repeat, "floor": FLOOR,
               "n_exact_pairs": len(exact_pairs), "ann": [], "neardup": [],
               "ivf": []}

        for planes, tables in ANN_SWEEP:
            rows, wall = timed(lambda: SIM.ann_lsh_topk(
                e, queries, "vec_id", "embedding", k=PQ.ANN_K,
                planes=planes, dim=PQ.EMBED_DIM, n_tables=tables))
            rec = {"planes": planes, "tables": tables,
                   "recall": recall_at_k(rows), "wall_sec": wall}
            out["ann"].append(rec)
            print(json.dumps({"axis": "ann", **rec}), file=sys.stderr)

        for planes, tables in NEARDUP_SWEEP:
            rows, wall = timed(lambda: SIM.cosine_pairs_banded(
                e, "vec_id", "embedding", threshold=PQ.COSINE_THRESHOLD,
                planes=planes, dim=PQ.EMBED_DIM, n_tables=tables))
            pairs = {(r["id_a"], r["id_b"]) for r in rows}
            assert pairs <= exact_pairs, (planes, tables)
            rec = {"planes": planes, "tables": tables,
                   "recall": round(len(pairs) / len(exact_pairs), 4)
                   if exact_pairs else 1.0,
                   "wall_sec": wall}
            out["neardup"].append(rec)
            print(json.dumps({"axis": "neardup", **rec}), file=sys.stderr)

        for cells, nprobe in IVF_SWEEP:
            rows, wall = timed(lambda: SIM.ann_topk_ivf(
                e, queries, "vec_id", "embedding", k=PQ.ANN_K,
                n_cells=cells, nprobe=nprobe, dim=PQ.EMBED_DIM))
            rec = {"cells": cells, "nprobe": nprobe,
                   "recall": recall_at_k(rows), "wall_sec": wall}
            out["ivf"].append(rec)
            print(json.dumps({"axis": "ivf", **rec}), file=sys.stderr)

        def knee(axis):
            ok = [r for r in out[axis] if r["recall"] >= FLOOR]
            return min(ok, key=lambda r: (r["wall_sec"], -r["recall"])) if ok else None

        out["best"] = {a: knee(a) for a in ("ann", "neardup", "ivf")}
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
