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
