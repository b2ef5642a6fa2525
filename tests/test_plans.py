"""Physical-plan shape assertions — the 100 TB contracts:

- the replay barrier reaches the parquet scan as pushed filters
  (partition-prunable at scale);
- slim-shuffle flatten re-attaches payloads via a BROADCAST semi join
  (payload side never shuffles);
- the broadcast merge plan contains no sort-merge join and no exchange
  of the target relation.
"""

import contextlib
import io

from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigquery_delta_plugins_spark import constants as C
from bigquery_delta_plugins_spark import schemas
from bigquery_delta_plugins_spark.operators.flatten import flatten_batch, replay_filter
from bigquery_delta_plugins_spark.operators.merge import merge_apply
from bigquery_delta_plugins_spark.sources.gen import synth_events

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_replay_barrier_pushes_down_to_parquet(spark, tmp_path):
    p = str(tmp_path / "staged")
    synth_events(spark, 2000, 100, batch_size=500).write.parquet(p)
    staged = spark.read.parquet(p)
    plan = plan_of(replay_filter(staged, batch_id=2, latest_merged_seq=900))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, plan
    assert "_sequence_num" in pushed[0] and "_batch_id" in pushed[0], pushed[0]


def test_slim_flatten_broadcasts_payload_rejoin(spark, tmp_path):
    p = str(tmp_path / "staged2")
    synth_events(spark, 2000, 100, batch_size=2000).write.parquet(p)
    staged = spark.read.parquet(p)
    plan = plan_of(flatten_batch(staged, ["url"]))
    # survivors are broadcast back onto the payload scan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


def test_broadcast_merge_has_no_target_exchange(spark):
    target_schema = schemas.target_schema(PAGES)
    target = spark.createDataFrame([], target_schema)
    staging = schemas.staging_schema(PAGES)
    diff = spark.createDataFrame([], staging)
    plan = plan_of(
        merge_apply(target, diff.drop(C.BATCH_ID), ["url"], strategy="broadcast")
    )
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def _target_parquet(spark, tmp_path, soft_rows=False):
    import os

    p = str(tmp_path / "tgt")
    spark.createDataFrame(
        [("u1", None, None, "t", "en", 1, True if soft_rows else None, None, None)],
        schemas.target_schema(PAGES),
    ).write.mode("overwrite").parquet(p)
    return spark.read.schema(schemas.target_schema(PAGES)).parquet(p), os.path.basename(p)


def test_broadcast_merge_ordered_hard_single_target_scan(spark, tmp_path):
    """The round-3 contract: in the default mode (ordered + hard
    deletes) the broadcast merge scans the target relation EXACTLY ONCE
    — one broadcast LeftAnti join, no second key pass (the dominant
    batch cost at 10^10-row scale is the touched-bucket scan)."""
    import re

    target, _ = _target_parquet(spark, tmp_path)
    diff = spark.createDataFrame([], schemas.staging_schema(PAGES)).drop(C.BATCH_ID)
    plan = plan_of(
        merge_apply(target, diff, ["url"], strategy="broadcast",
                    unique_key_target=True)
    )
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, re.M)
    assert len(scans) == 1, plan
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_broadcast_merge_soft_second_scan_is_key_only(spark, tmp_path):
    """Soft-delete (and unordered) modes need target state for the
    matched-arm guards, so a second pass exists — but it must read ONLY
    the key columns (column pruning to the parquet scan), a few % of
    bytes on a payload-heavy table."""
    import re

    target, _ = _target_parquet(spark, tmp_path, soft_rows=True)
    diff = spark.createDataFrame([], schemas.staging_schema(PAGES)).drop(C.BATCH_ID)
    plan = plan_of(
        merge_apply(target, diff, ["url"], strategy="broadcast", soft_deletes=True)
    )
    schemas_read = re.findall(r"ReadSchema: (struct<[^>]*>)", plan)
    assert len(schemas_read) == 2, plan
    assert any(s == "struct<url:string>" for s in schemas_read), schemas_read


def test_banded_cosine_has_no_nested_loop_join(spark):
    """embed_cosine_neardup's scale contract: the pair search is an
    equi-join on the LSH bucket, never a BroadcastNestedLoopJoin
    cartesian (round 1's scale-killer)."""
    from bigquery_delta_plugins_spark.operators.similarity import cosine_pairs_banded

    df = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, 0.5, -1.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    # eager_release=False keeps the lazy plan inspectable (production
    # callers get the same plan, then an eager checkpoint of the result)
    plan = plan_of(cosine_pairs_banded(df, "vec_id", "embedding", planes=2, dim=4,
                                       eager_release=False))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ivf_probe_is_cell_equijoin(spark):
    """ann_topk_ivf joins corpus to queries on the quantizer cell — a
    (broadcast) hash equi-join, candidates bounded per cell."""
    from bigquery_delta_plugins_spark.operators.similarity import ann_topk_ivf

    df = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, 0.5, -1.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    plan = plan_of(
        ann_topk_ivf(df, df.filter(F.col("vec_id") < 2), "vec_id", "embedding",
                     k=2, n_cells=4, nprobe=2, dim=4)
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, plan


def test_shuffle_merge_uses_key_exchange(spark):
    target = spark.createDataFrame([], schemas.target_schema(PAGES))
    diff = spark.createDataFrame([], schemas.staging_schema(PAGES)).drop(C.BATCH_ID)
    plan = plan_of(merge_apply(target, diff, ["url"], strategy="shuffle"))
    assert "FullOuter" in plan or "SortMergeJoin" in plan or "Exchange" in plan, plan


def test_changelog_diff_is_single_keyed_join(spark, tmp_path):
    """The snapshot diff is ONE keyed full-outer join (SortMergeJoin
    FullOuter, or broadcast if AQE so decides) with exactly one exchange
    per side — no extra shuffles, no BroadcastNestedLoopJoin, and the
    unchanged-key filter sits above the join, not in a second pass."""
    from bigquery_delta_plugins_spark.operators.changes import changelog_diff

    old_p, new_p = str(tmp_path / "old"), str(tmp_path / "new")
    rows = [(i, float(i), i + 1, None) for i in range(500)]
    schema = "user_id long, value double, _sequence_num long, _is_deleted boolean"
    spark.createDataFrame(rows, schema).write.parquet(old_p)
    spark.createDataFrame(rows[100:] + [(1000, 1.0, 9999, None)], schema).write.parquet(new_p)
    df = changelog_diff(
        spark.read.parquet(old_p), spark.read.parquet(new_p), ["user_id"]
    )
    plan = plan_of(df)
    assert "FullOuter" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    import re

    # the formatted plan prints each operator once in the tree and once
    # in the detail section — count unique operator ids
    joins = re.findall(r"^\(\d+\) (\w*Join)", plan, re.M)
    assert joins in (["SortMergeJoin"], ["ShuffledHashJoin"],
                     ["BroadcastHashJoin"]), joins
    exchanges = re.findall(r"^\(\d+\) (Exchange)", plan, re.M)
    assert len(exchanges) <= 2, plan


def test_star_join_broadcasts_dims_and_pushes_brand_filter(spark):
    """Q9 shape: the brand filter reaches the part scan as a pushed
    filter, and the dimension joins are broadcast — no shuffle of the
    small sides."""
    from bigquery_delta_plugins_spark.plans.pipeline_queries import (
        tpch_profit_by_nation,
    )

    plan = plan_of(tpch_profit_by_nation(spark, "/root/testdata/sf0.001"))
    pushed = [l for l in plan.splitlines()
              if "PushedFilters" in l and "p_brand" in l]
    assert pushed, plan
    assert "BroadcastHashJoin" in plan, plan


def test_shipping_priority_topk_and_pushed_dates(spark):
    """Q3 shape: the cutoff date reaches BOTH fact scans as pushed
    filters, the segment dim broadcasts, and the deterministic top-10
    compiles to TakeOrderedAndProject (per-partition heaps), never a
    global Sort."""
    from bigquery_delta_plugins_spark.plans.pipeline_queries import (
        tpch_shipping_priority,
    )

    plan = plan_of(tpch_shipping_priority(spark, "/root/testdata/sf0.001"))
    assert any("PushedFilters" in l and "l_shipdate" in l
               for l in plan.splitlines()), plan
    assert any("PushedFilters" in l and "o_orderdate" in l
               for l in plan.splitlines()), plan
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_late_shipments_window_pushed_single_agg(spark):
    """Q12 shape: the ship-date window is pushed into the lineitem
    scan and the late/total split is ONE partial aggregate — exactly
    one shuffle pair (join + final agg), no extra pass for the CASE."""
    from bigquery_delta_plugins_spark.plans.pipeline_queries import (
        tpch_late_shipments,
    )

    plan = plan_of(tpch_late_shipments(spark, "/root/testdata/sf0.001"))
    assert any("PushedFilters" in l and "l_shipdate" in l
               for l in plan.splitlines()), plan
    assert plan.count("HashAggregate") <= 4, plan


def test_decontaminate_is_broadcast_semi_no_corpus_shuffle(spark, monkeypatch):
    """N31 shape: the (eval-suite-bounded) benchmark gram set broadcasts
    into a LEFT SEMI over the corpus's exploded grams — the corpus side
    must never be exchange-partitioned by gram, and nothing may fall
    back to a nested-loop/cartesian join."""
    from bigquery_delta_plugins_spark.plans import pipeline_queries as P

    # the shipped query eagerly checkpoints the result and releases the
    # persisted gram index (r6: the corpus is tokenized once) — bypass
    # the epilogue to read the REAL plan
    released = []
    monkeypatch.setattr(
        P.DD, "_finish",
        lambda result, releases, eager_release: (released.extend(releases), result)[1],
    )
    plan = plan_of(P.text_decontaminate(spark, "/root/testdata/sf0.001"))
    for df_ in released:
        df_.unpersist()
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # exchanges: bench-gram distinct (1) + per-doc count (1) + the two
    # broadcasts — but no sort-merge-join exchange pair on the corpus
    assert "SortMergeJoin" not in plan, plan


def test_tfidf_topk_pushes_group_limit_and_releases_tfc(spark, monkeypatch):
    """N32 shape: the per-doc top-k must use Spark's WindowGroupLimit
    pushdown (partial top-k before the exchange, not a full per-doc
    sort of every term), and the persisted (doc,term) counts frame is
    released once the small result is checkpointed (dedup-family
    hygiene)."""
    from bigquery_delta_plugins_spark.plans import pipeline_queries as P

    # the shipped query eagerly checkpoints via DD._finish (its explain
    # is just the checkpoint scan) — bypass the epilogue to read the
    # REAL plan, then run the shipped path for the hygiene assertion
    released = []
    monkeypatch.setattr(
        P.DD, "_finish",
        lambda result, releases, eager_release: (released.extend(releases), result)[1],
    )
    plan = plan_of(P.text_tfidf_topk(spark, "/root/testdata/sf0.001"))
    assert "WindowGroupLimit" in plan, plan
    for df_ in released:
        df_.unpersist()
    monkeypatch.undo()

    sc = spark.sparkContext
    pre = {
        i.id() for i in sc._jsc.sc().getRDDStorageInfo()
        if i.memSize() + i.diskSize() > 0
    }
    df = P.text_tfidf_topk(spark, "/root/testdata/sf0.001")
    assert df.count() > 0
    remaining = [
        i for i in sc._jsc.sc().getRDDStorageInfo()
        if i.memSize() + i.diskSize() > 0 and i.id() not in pre
    ]
    # only the (tiny) checkpointed result may linger, never the tfc index
    assert len(remaining) <= 1, [(i.name(), i.memSize()) for i in remaining]
