"""O28 assessor: column verdicts, missing-PK, duplicate normalized
names, unsupported MAP type (ported from BigQueryAssessorTest.java)."""

from pyspark.sql import types as T

from bigquery_delta_plugins_spark.plans.assess import assess_job, assess_table

GOOD = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name!", T.StringType(), True),
        T.StructField("price", T.DecimalType(10, 2), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
    ]
)


def test_assess_table_verdicts():
    a = assess_table("orders", GOOD, ["id"])
    by = {c.name: c for c in a.columns}
    assert by["id"].target_type == "INT64" and by["id"].support == "YES"
    assert by["name!"].normalized_name == "name_"
    assert by["price"].target_type == "NUMERIC"
    assert by["tags"].target_type == "STRING REPEATED"
    assert a.clustering_keys == ["id"]
    assert not [p for p in a.problems if p.kind != "RENAMED"]


def test_missing_pk_and_map_problems():
    bad = T.StructType([T.StructField("m", T.MapType(T.StringType(), T.LongType()))])
    a = assess_table("t", bad, [])
    kinds = {p.kind for p in a.problems}
    assert "MISSING_PRIMARY_KEY" in kinds and "UNSUPPORTED_TYPE" in kinds
    assert a.columns[0].support == "NO"


def test_duplicate_normalized_table_names():
    # 'a!b' and 'a?b' both normalize to 'a_b' -> problem on the second
    # (BigQueryAssessorTest.java:32-65 analog)
    outs = assess_job({
        "a!b": (GOOD, ["id"]),
        "a?b": (GOOD, ["id"]),
    })
    dups = [p for a in outs for p in a.problems if p.kind == "DUPLICATE_TABLE"]
    assert len(dups) == 1
