"""Max-sequence-number resume points.

Reference: per-table ``SELECT MAX(_sequence_num)`` (BigQueryUtils.java:
150-184) and the batched multi-table UNION ALL variant used at cold
start to seed the source's sequence counter (BigQueryUtils.java:86-145,
cap of 1000 tables per query BigQueryTarget.java:80).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import constants as C


def max_sequence_num(table_df: DataFrame) -> int:
    """MAX(_sequence_num) over one table, NULL (empty table) -> 0
    (BigQueryUtils.java:161-184)."""
    row = table_df.agg(F.max(C.SEQUENCE_NUM).alias("m")).first()
    return row["m"] if row and row["m"] is not None else 0


def max_sequence_num_all(
    tables: list[DataFrame], batch_size: int = C.MAX_TABLES_PER_MAX_SEQ_QUERY
) -> int:
    """Global max across all replicated tables, batched <=1000 per plan
    (BigQueryUtils.java:86-145).  Each per-table max is a partial
    aggregation pushed next to its scan; the union is over 1-row frames."""
    if not tables:
        return 0
    overall = 0
    for i in range(0, len(tables), batch_size):
        chunk = [
            t.agg(F.max(C.SEQUENCE_NUM).alias("max_seq"))
            for t in tables[i : i + batch_size]
        ]
        unioned = reduce(DataFrame.unionAll, chunk)
        row = unioned.agg(F.max("max_seq").alias("m")).first()
        if row and row["m"] is not None:
            overall = max(overall, row["m"])
    return overall
