"""HTML -> text extraction as a vectorized Arrow/pandas UDF.

The north rule requires byte-identical extracted text per url between
the vectorized path and a scalar reference implementation
(BASELINE.json input_hint).  Both paths below share the exact same
regex pipeline, applied in the same order with the same replacement
strings, so equality holds byte-for-byte:

1. drop <script>/<style> elements including their content
2. strip remaining tags
3. collapse ASCII-whitespace runs to single spaces, trim spaces

``extract_text_udf`` moves data via Arrow batches and uses pandas
vectorized string ops — no per-row Python on the Spark side.
``extract_text_py`` is the scalar oracle used by tests to assert
sha256-per-row equality.

Every regex below is deliberately RE2-expressible (no backreferences,
explicit ASCII whitespace class) so a THIRD, fully independent engine
can replay the pipeline: the ``web_text_extract`` driver query runs
the same three substitutions as DuckDB ``regexp_replace`` (RE2) and
must hash-match this UDF byte-for-byte.  Python ``re`` and RE2 agree
on these constructs (leftmost-first alternation, lazy ``.*?``, inline
``(?is)`` flags, ASCII classes).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# one pass, leftmost-first — equivalent to <(script|style)>.*?</\1> but
# with the backreference unrolled so RE2 can run the identical pattern
_SCRIPT_RE = r"(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>"
_TAG_RE = r"(?s)<[^>]+>"
# explicit ASCII class: Python's \s also eats unicode whitespace
# (\xa0,  , ...), RE2's does not — pin the ASCII semantics both
# engines share
_WS_RE = r"[ \t\n\r\f\v]+"


def extract_text_py(html: bytes | None) -> str | None:
    """Scalar reference implementation (the per-row oracle)."""
    if html is None:
        return None
    s = html.decode("utf-8")
    s = re.sub(_SCRIPT_RE, " ", s)
    s = re.sub(_TAG_RE, " ", s)
    s = re.sub(_WS_RE, " ", s)
    return s.strip(" ")


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-vectorized extraction over a binary html column."""
    s = html.str.decode("utf-8")
    s = s.str.replace(_SCRIPT_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    s = s.str.replace(_WS_RE, " ", regex=True)
    return s.str.strip(" ")


def extract_text_transform(staged):
    """Staged-batch row transform for ``EventConsumer(row_transform=...)``:
    fill the ``text`` column from ``html`` (rows with no html keep their
    text — e.g. DELETE events whose row image is in ``_before_*``)."""
    from pyspark.sql import functions as F

    return staged.withColumn(
        "text",
        F.when(F.col("html").isNotNull(), extract_text_udf(F.col("html"))).otherwise(
            F.col("text")
        ),
    )
