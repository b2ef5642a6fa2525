#!/usr/bin/env python
"""Print the approximate-path recall report as one JSON line.

Usage: python tools/recall_report.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from bench import build_session
    from bigquery_delta_plugins_spark.plans.recall import recall_report

    spark = build_session(int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    try:
        print(json.dumps(recall_report(spark, sf_dir)))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
