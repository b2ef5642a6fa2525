#!/usr/bin/env python
"""Local replica of the driver's CORRECTNESS gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, column names, and values (columns sorted by name,
rows sorted by the stringified tuple — mirroring a value-hash check).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # match a value-hash on the shortest round-trip repr
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from bench import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    spark = build_session(int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        s_cols = list(sdf.columns)
        s_rows = [tuple(r) for r in sdf.collect()]
        if name not in osql:
            print(f"{name}: NO-ORACLE (rows={len(s_rows)})")
            continue
        res = con.execute(osql[name])
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
        sc, sv = frame_sig(s_cols, s_rows)
        dc, dv = frame_sig(d_cols, d_rows)
        if sc != dc:
            print(f"{name}: SCHEMA-MISMATCH spark={sc} duckdb={dc}")
            failures += 1
        elif len(sv) != len(dv):
            print(f"{name}: ROWCOUNT-MISMATCH spark={len(sv)} duckdb={len(dv)}")
            failures += 1
        elif sv != dv:
            bad = next(i for i, (a, b) in enumerate(zip(sv, dv)) if a != b)
            print(f"{name}: VALUE-MISMATCH at sorted-row {bad}:")
            print(f"  spark : {sv[bad]}")
            print(f"  duckdb: {dv[bad]}")
            failures += 1
        else:
            print(f"{name}: MATCH ({len(sv)} rows)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
