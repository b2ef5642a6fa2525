"""JSON staging codec (O3): lossless round trip of staged CDC events —
binary html as base64, micros timestamps, nulls — plus the PERMISSIVE
malformed-line contract and the gated-Avro probe."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigquery_delta_plugins_spark.sources.gen import synth_events
from bigquery_delta_plugins_spark.sources.json_events import (
    avro_available,
    parse_staged_json,
    read_staged_json,
    staged_json_lines,
    write_staged_json,
)


def test_staged_events_roundtrip_exact(spark, tmp_path):
    """The full staged-event shape (strings, longs, binary payloads,
    null _before_* keys) survives encode -> text files -> decode with
    zero row diffs and the identical schema."""
    ev = synth_events(spark, 2000, 100, pk_move_frac=0.05)
    path = str(tmp_path / "staged-json")
    write_staged_json(ev, path)
    back = read_staged_json(spark, path, ev.schema)
    # from_json yields nullable fields regardless of the input schema's
    # nullability flags — names and types must round-trip exactly
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in ev.schema.fields
    ]
    assert ev.exceptAll(back).count() == 0
    assert back.exceptAll(ev).count() == 0


def test_binary_rides_as_base64(spark):
    """Spark's JSON contract for BinaryType is base64 — assert the wire
    form explicitly so an external JSON producer knows the encoding."""
    import base64

    df = spark.createDataFrame(
        [("u1", b"\x00\xffhtml")],
        T.StructType(
            [
                T.StructField("url", T.StringType()),
                T.StructField("html", T.BinaryType()),
            ]
        ),
    )
    line = staged_json_lines(df).first()["value"]
    assert base64.b64encode(b"\x00\xffhtml").decode() in line
    back = parse_staged_json(staged_json_lines(df), df.schema).first()
    assert bytes(back["html"]) == b"\x00\xffhtml"


def test_malformed_line_yields_nulls_not_failure(spark):
    schema = T.StructType([T.StructField("a", T.LongType())])
    lines = spark.createDataFrame([("{\"a\": 1}",), ("not json",)], ["value"])
    got = parse_staged_json(lines, schema).collect()
    assert sorted([r["a"] for r in got], key=lambda x: (x is None, x)) == [1, None]


def test_micros_timestamp_fidelity(spark):
    """Default to_json keeps millis only; the codec's explicit format
    must carry full microseconds both directions."""
    df = spark.sql(
        "SELECT TIMESTAMP_NTZ '2024-01-01 00:09:58.778549' AS ts"
    )
    back = parse_staged_json(staged_json_lines(df), df.schema).first()
    assert back["ts"].microsecond == 778549


def test_avro_gate_is_honest(spark):
    """avro_available() must agree with an actual to_avro attempt (the
    container ships no spark-avro module jar, so this documents the
    gated path rather than assuming)."""
    ok = avro_available(spark)
    try:
        from pyspark.sql.avro.functions import to_avro

        spark.range(1).select(to_avro(F.struct("id"))).collect()
        really = True
    except Exception:
        really = False
    assert ok == really
