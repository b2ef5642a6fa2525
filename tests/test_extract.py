"""Byte-identical text extraction: vectorized pandas UDF vs the scalar
reference implementation, sha256 per row (north-rule per-row invariant)."""

import hashlib

from pyspark.sql import functions as F

from bigquery_delta_plugins_spark.functions.extract import (
    extract_text_py,
    extract_text_udf,
)
from bigquery_delta_plugins_spark.sources.gen import make_html, synth_pages


def test_extract_udf_matches_scalar_reference_per_row(spark):
    pages = synth_pages(spark, 500).withColumn("text", extract_text_udf("html"))
    rows = pages.select("url", "html", "text").collect()
    assert len(rows) == 500
    for r in rows:
        expected = extract_text_py(bytes(r["html"]))
        assert r["text"] == expected, r["url"]
        assert (
            hashlib.sha256(r["text"].encode()).hexdigest()
            == hashlib.sha256(expected.encode()).hexdigest()
        )


def test_extract_strips_script_and_tags(spark):
    html = b"<html><head><script>var x='<p>no</p>';</script></head><body><p>hello   world</p></body></html>"
    assert extract_text_py(html) == "hello world"


def test_extract_re2_safe_semantics(spark):
    """The pipeline's regexes are RE2-expressible BY DESIGN (no
    backreferences, ASCII whitespace class) so the web_text_extract
    oracle can replay them in DuckDB.  Pin the cases where the design
    choices bite:

    - leftmost-first single pass over script|style (NOT sequential
      script-then-style passes, which diverge on interleaved tags)
    - case-insensitive tag match
    - unicode whitespace (\\xa0) is CONTENT, not collapsible whitespace
      — Python's \\s would eat it, RE2's cannot, so the shared ASCII
      class keeps it"""
    # interleaved: leftmost <style> wins, its lazy close at </style>
    interleaved = b"a <style>x<script>y</style>z</script> b"
    assert extract_text_py(interleaved) == "a z b"
    # sequential script-first would instead give 'a <style>x' -> 'a x'
    assert extract_text_py(b"<SCRIPT>gone</SCRIPT><P>kept</P>") == "kept"
    nbsp = "n\xa0b".encode("utf-8")
    assert extract_text_py(nbsp) == "n\xa0b"


def test_extract_udf_matches_re2_oracle_rowwise(spark):
    """The driver-shaped check, in-process: run web_text_extract's
    Spark side and its DuckDB RE2 oracle on the same parquet and
    compare every row (the CORRECTNESS gate does the same at sf0.01)."""
    import duckdb

    from bigquery_delta_plugins_spark.plans import pipeline_queries as P

    sf_dir = "/root/testdata/sf0.001"
    sdf = P.web_text_extract(spark, sf_dir)
    spark_rows = {r["doc_id"]: r["extracted"] for r in sdf.collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    duck_rows = dict(con.execute(P._sql_web_text_extract()).fetchall())
    assert spark_rows == duck_rows
    assert len(spark_rows) >= 50


def test_extract_is_deterministic_across_partitionings(spark):
    one = (
        synth_pages(spark, 100)
        .repartition(1)
        .withColumn("text", extract_text_udf("html"))
        .select("url", "text")
    )
    many = (
        synth_pages(spark, 100)
        .repartition(16)
        .withColumn("text", extract_text_udf("html"))
        .select("url", "text")
    )
    assert {tuple(r) for r in one.collect()} == {tuple(r) for r in many.collect()}


def test_make_html_depends_on_version(spark):
    df = spark.range(1).select(
        make_html(F.lit("https://x/1"), F.lit(0)).alias("a"),
        make_html(F.lit("https://x/1"), F.lit(1)).alias("b"),
    )
    r = df.first()
    assert bytes(r["a"]) != bytes(r["b"])
