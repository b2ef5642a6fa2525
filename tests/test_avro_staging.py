"""Avro Object Container staging codec (O2): pure-Python encode/decode
against the public Avro spec, plus the distributed Spark surfaces
(mapInArrow writer: one container file per partition; binaryFile +
mapInArrow reader).  Mirrors the JSON codec's roundtrip contract
(test_json_staging.py)."""

import datetime

from pyspark.sql import types as T

from bigquery_delta_plugins_spark.sources.avro_staging import (
    avro_schema,
    decode_container,
    encode_container,
    read_staged_avro,
    write_staged_avro,
)

FLAT = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("ratio", T.DoubleType(), True),
        T.StructField("flag", T.BooleanType(), True),
        T.StructField("html", T.BinaryType(), True),
    ]
)

ROWS = [
    ("INSERT", 1, 7, 0.5, True, b"\x00\xffhtml"),
    ("DELETE", 2, None, None, None, None),
    # full-range long: would corrupt through a float64 (pandas) path
    ("UPDATE", 3, (1 << 62) + 12345, -1.25e300, False, b""),
    ("INSERT", 4, -5, float("inf"), True, b"\x80" * 17),
]


def test_container_roundtrip_pure_python():
    data = encode_container(ROWS, FLAT)
    assert data[:4] == b"Obj\x01"
    assert decode_container(data, FLAT) == ROWS


def test_container_deterministic_and_empty():
    assert encode_container(ROWS, FLAT) == encode_container(ROWS, FLAT)
    empty = encode_container([], FLAT)
    assert decode_container(empty, FLAT) == []


def test_avro_schema_shape():
    s = avro_schema(FLAT)
    assert s["type"] == "record"
    assert [f["name"] for f in s["fields"]] == [f.name for f in FLAT.fields]
    assert s["fields"][0]["type"] == "string"  # non-null
    assert s["fields"][2]["type"] == ["null", "long"]  # nullable union


def test_schema_mismatch_raises():
    import pytest

    other = T.StructType([T.StructField("x", T.LongType())])
    with pytest.raises(ValueError, match="schema mismatch"):
        decode_container(encode_container(ROWS, FLAT), other)


def test_union_ness_follows_wire_schema_not_reader_nullability():
    """A file written with nullable (union-encoded) fields must parse
    when the READER's Spark schema is stricter (non-nullable), and vice
    versa: the wire schema owns the encoding."""
    loose = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in FLAT.fields]
    )
    strict = T.StructType(
        [T.StructField(f.name, f.dataType, False) for f in FLAT.fields]
    )
    no_none = [r for r in ROWS if None not in r]
    # written loose (unions on the wire), read strict
    assert decode_container(encode_container(no_none, loose), strict) == no_none
    # written strict (no unions), read loose
    assert decode_container(encode_container(no_none, strict), loose) == no_none


def test_negative_metadata_block_count_interop():
    """Avro spec: a map block may carry a NEGATIVE entry count, meaning
    abs(n) entries preceded by the block's byte size — external writers
    that support skipping emit this form.  Rewrite our header's map with
    a negative count and verify the decoder still parses it."""
    import io

    from bigquery_delta_plugins_spark.sources.avro_staging import (
        _read_bytes,
        _read_long,
        _write_bytes,
        _write_long,
    )

    data = encode_container(ROWS, FLAT)
    mv = memoryview(data)
    # parse our own positive-count header: magic, count=2, 2 kv pairs, 0
    pos = 4
    n, pos = _read_long(mv, pos)
    assert n == 2
    entries = []
    for _ in range(n):
        k, pos = _read_bytes(mv, pos)
        v, pos = _read_bytes(mv, pos)
        entries.append((k, v))
    end, pos = _read_long(mv, pos)
    assert end == 0
    # re-emit with count=-2 + block byte size
    body = io.BytesIO()
    for k, v in entries:
        _write_bytes(body, k)
        _write_bytes(body, v)
    head = io.BytesIO()
    head.write(b"Obj\x01")
    _write_long(head, -2)
    _write_long(head, len(body.getvalue()))
    head.write(body.getvalue())
    _write_long(head, 0)
    rewritten = head.getvalue() + data[pos:]
    assert decode_container(rewritten, FLAT) == ROWS


def test_staged_events_avro_roundtrip_exact(spark, tmp_path):
    """The full staged-event shape (strings, longs, binary payloads,
    null _before_* keys) survives encode -> container files -> decode
    with zero row diffs — the Avro twin of the JSON roundtrip."""
    from bigquery_delta_plugins_spark.sources.gen import synth_events

    ev = synth_events(spark, 2000, 100, pk_move_frac=0.05)
    path = str(tmp_path / "staged-avro")
    n_files = write_staged_avro(ev, path)
    assert n_files >= 1
    back = read_staged_avro(spark, path, ev.schema)
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in ev.schema.fields
    ]
    assert ev.exceptAll(back).count() == 0
    assert back.exceptAll(ev).count() == 0


def test_container_roundtrip_property():
    """Property: ANY batch of staged-shaped rows round-trips exactly
    through the container codec (no Spark — pure wire-format check).
    Covers negative/full-range zigzag longs, NaN/inf doubles, empty and
    non-ASCII strings, empty/NUL-laden binary, and every null layout."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    i64 = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)
    doubles = st.floats(allow_nan=True, allow_infinity=True, width=64)
    row = st.tuples(
        st.text(max_size=20),
        i64,
        st.one_of(st.none(), i64),
        st.one_of(st.none(), doubles),
        st.one_of(st.none(), st.booleans()),
        st.one_of(st.none(), st.binary(max_size=40)),
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(row, max_size=50))
    def check(rows):
        back = decode_container(encode_container(rows, FLAT), FLAT)
        assert len(back) == len(rows)
        for got, want in zip(back, rows):
            for g, w in zip(got, want):
                if isinstance(w, float) and w != w:  # NaN
                    assert g != g
                else:
                    assert g == w

    check()


def test_in_plan_roundtrip_exact(spark):
    """roundtrip_through_container: the filesystem-free wire-format
    round trip (used by the cdc_avro_staging_roundtrip driver query) is
    row-exact, including nulls, binary payloads, and full-range longs."""
    from bigquery_delta_plugins_spark.sources.avro_staging import (
        roundtrip_through_container,
    )

    df = spark.createDataFrame(ROWS, FLAT).repartition(3)
    back = roundtrip_through_container(df)
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in FLAT.fields
    ]
    assert df.exceptAll(back).count() == 0
    assert back.exceptAll(df).count() == 0


def test_timestamps_roundtrip_micros_exact(spark, tmp_path):
    """Both timestamp flavors ride as int64 micros logical longs and
    come back to the microsecond."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("ts", T.TimestampNTZType(), True),
        ]
    )
    rows = [
        (1, datetime.datetime(2026, 8, 17, 12, 0, 0, 123456)),
        (2, None),
        (3, datetime.datetime(1969, 12, 31, 23, 59, 59, 999999)),
    ]
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "ts-avro")
    write_staged_avro(df, path)
    back = read_staged_avro(spark, path, schema)
    got = {r["id"]: r["ts"] for r in back.collect()}
    assert got == {i: ts for i, ts in rows}
