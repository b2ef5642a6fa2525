"""Deterministic synthetic Common-Crawl-style pages and CDC event stream.

Input shape per BASELINE.json ``input_hint``: pages table
``(url string, warc_ts timestamp, html binary, text string, lang string)``
with primary key ``url``.  The event stream is a binlog-style sequence of
INSERT/UPDATE/DELETE staged events over that table (the role the Delta
source plays for the reference plugin; we generate instead of tailing).

Everything is generated with Spark built-in expressions from
``spark.range`` — fully distributed, no driver-side loops, and
deterministic regardless of partitioning because all randomness is
``xxhash64(id, seed)``-derived (never ``rand()``, whose output depends
on partition layout).

Url popularity is Zipf-ish via an inverse-power transform of a uniform
hash — a few hot urls receive a large share of UPDATE events, the
north-rule hot-key scenario.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import constants as C

LANGS = ["en", "de", "fr", "es", "zh", "ja", "pt", "ru"]


def _u01(col: Column, seed: int, tag: int) -> Column:
    """Deterministic uniform [0,1) from a column value."""
    h = F.xxhash64(col, F.lit(seed), F.lit(tag))
    return (F.pmod(h, F.lit(1_000_000_007)).cast("double")) / F.lit(1_000_000_007.0)


def _page_url(idx: Column) -> Column:
    return F.concat(
        F.lit("https://site-"),
        F.pmod(idx, F.lit(997)).cast("string"),
        F.lit(".example.com/page/"),
        idx.cast("string"),
    )


def make_html(url: Column, version: Column, seed: int = 42) -> Column:
    """Deterministic synthetic html for (url, version): title, a script
    block (stripped by extraction), and a hash-chained word body."""
    h = F.xxhash64(url, version, F.lit(seed))
    n_words = (F.pmod(h, F.lit(40)) + 20).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(url, version, i, F.lit(seed)), F.lit(99991)).cast("string")
        ),
    )
    body = F.array_join(words, " ")
    return F.concat(
        F.lit("<html><head><title>Page "),
        F.abs(h).cast("string"),
        F.lit("</title><script>var x = 'junk"),
        F.abs(F.xxhash64(h)).cast("string"),
        F.lit("';</script></head>\n<body><h1>Entry</h1>\n<p>"),
        body,
        F.lit("</p>\n</body></html>"),
    ).cast("binary")


def synth_pages(spark: SparkSession, n_pages: int, seed: int = 42) -> DataFrame:
    """Snapshot pages table in the input_hint shape (text column filled
    by the caller via functions.extract to keep generation JVM-only)."""
    df = spark.range(n_pages)
    url = _page_url(F.col("id"))
    return df.select(
        url.alias("url"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("warc_ts"),
        make_html(url, F.lit(0), seed).alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.element_at(
            F.array(*[F.lit(x) for x in LANGS]),
            (F.pmod(F.xxhash64(url, F.lit(seed), F.lit(7)), F.lit(len(LANGS))) + 1).cast("int"),
        ).alias("lang"),
    )


def synth_events(
    spark: SparkSession,
    n_events: int,
    n_urls: int,
    *,
    seed: int = 42,
    zipf_exponent: float = 2.0,
    delete_frac: float = 0.05,
    pk_move_frac: float = 0.02,
    batch_size: int | None = None,
    start_seq: int = 1,
) -> DataFrame:
    """Ordered staged CDC events over the pages keyspace.

    Per event (seq = start_seq + id, strictly monotone):

    - target url index: ``floor(n_urls * u^zipf_exponent)`` of a
      deterministic uniform ``u`` — Zipf-like skew (index 0 hottest).
    - op: a valid per-url binlog.  The first event of a url is INSERT,
      a DELETE is always followed by a re-INSERT (never two DELETEs in a
      row, never an UPDATE of a deleted row), UPDATEs otherwise — so the
      stream is exactly the class of inputs the reference's MERGE is
      specified over.  Validity is achieved without recursion: an event
      is a DELETE iff its uniform draw is under ``delete_frac`` AND the
      previous event's draw was not (no two consecutive deletes), and an
      event re-INSERTs iff the previous event was a DELETE.
    - A ``pk_move_frac`` slice of UPDATEs moves the primary key to a
      versioned url (``...?v=<seq>``); subsequent events for that url
      index follow the *moved* key (windowed last-move lookup), keeping
      the binlog valid and exercising chained-PK semantics.
    - html: deterministic ``make_html(url, seq)``; DELETE carries the
      row image in the ``_before_*`` key columns, exactly as the
      reference writer populates staging rows
      (MultiGCSWriter.java:428-448).

    The per-url windows are generation-time only — the engine under
    test never relies on them.
    """
    from pyspark.sql import Window

    df = spark.range(n_events)
    seq_col = (F.col("id") + F.lit(start_seq)).alias(C.SEQUENCE_NUM)
    u = _u01(F.col("id"), seed, 1)
    url_idx = F.floor(F.lit(float(n_urls)) * F.pow(u, F.lit(float(zipf_exponent))))

    df = df.select(F.col("id"), seq_col, url_idx.alias("__idx"))

    w = Window.partitionBy("__idx").orderBy(C.SEQUENCE_NUM)
    u_del = _u01(F.col("id"), seed, 2)
    u_mv = _u01(F.col("id"), seed, 3)
    df = (
        df.withColumn("__rank", F.row_number().over(w))
        .withColumn("__u_del", u_del)
        .withColumn("__u_mv", u_mv)
        .withColumn("__prev_del_draw", F.lag("__u_del").over(w))
    )
    is_delete = (
        (F.col("__rank") > 1)
        & (F.col("__u_del") < F.lit(delete_frac))
        & (F.col("__prev_del_draw") >= F.lit(delete_frac))
    )
    prev_was_delete = F.lag(is_delete.cast("int")).over(w) == 1
    op = (
        F.when(F.col("__rank") == 1, F.lit(C.OP_INSERT))
        .when(F.coalesce(prev_was_delete, F.lit(False)), F.lit(C.OP_INSERT))
        .when(is_delete, F.lit(C.OP_DELETE))
        .otherwise(F.lit(C.OP_UPDATE))
    )
    df = df.withColumn(C.OPERATION, op)

    is_move = (
        (F.col(C.OPERATION) == C.OP_UPDATE) & (F.col("__u_mv") < F.lit(pk_move_frac))
    )
    df = df.withColumn("__move_seq", F.when(is_move, F.col(C.SEQUENCE_NUM)))
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    # suffix of the last PK move before this event — the key the row
    # currently lives under
    cur_move = F.last("__move_seq", ignorenulls=True).over(w_prev)
    base_url = _page_url(F.col("__idx"))
    cur_url = F.when(
        cur_move.isNotNull(),
        F.concat(base_url, F.lit("?v="), cur_move.cast("string")),
    ).otherwise(base_url)

    new_url = F.when(
        is_move,
        F.concat(base_url, F.lit("?v="), F.col(C.SEQUENCE_NUM).cast("string")),
    ).otherwise(cur_url)

    before_url = F.when(
        F.col(C.OPERATION) == C.OP_INSERT, F.lit(None).cast("string")
    ).otherwise(cur_url)
    seq_col = F.col(C.SEQUENCE_NUM)

    seq_col = F.col(C.SEQUENCE_NUM)
    batch = (
        F.floor((seq_col - F.lit(start_seq)) / F.lit(batch_size))
        if batch_size
        else F.lit(0)
    ).cast("long")

    html = make_html(new_url, seq_col, seed)
    out = df.select(
        F.col(C.OPERATION),
        batch.alias(C.BATCH_ID),
        seq_col,
        new_url.alias("url"),
        F.timestamp_seconds(F.lit(1_700_000_000) + seq_col).alias("warc_ts"),
        html.alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.element_at(
            F.array(*[F.lit(x) for x in LANGS]),
            (F.pmod(F.xxhash64(new_url, F.lit(seed), F.lit(7)), F.lit(len(LANGS))) + 1).cast("int"),
        ).alias("lang"),
        before_url.alias("_before_url"),
        F.lit(None).cast("timestamp").alias("_before_warc_ts"),
        F.when(F.col(C.OPERATION) == C.OP_DELETE, html).alias("_before_html"),
        F.lit(None).cast("string").alias("_before_text"),
        F.lit(None).cast("string").alias("_before_lang"),
    )
    return out
