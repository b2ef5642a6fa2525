"""Tests for the training-data-pipeline operators: text stats, dedup
(exact / Jaccard / MinHash-LSH / SimHash), embedding similarity, and
multimodal binary plumbing."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigquery_delta_plugins_spark.functions import text as TX
from bigquery_delta_plugins_spark.functions.multimodal import (
    extract_features,
    with_binary_payload,
)
from bigquery_delta_plugins_spark.operators import dedup as DD
from bigquery_delta_plugins_spark.operators import similarity as SIM

from conftest import rows_set


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
        (2, "der hund und die katze und das haus"),
        (3, "completely different words entirely unrelated tokens"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (5, "solo"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------------ text


def test_token_stats(spark, docs):
    out = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            TX.token_count(F.col("text")).alias("n"),
            TX.distinct_token_count(F.col("text")).alias("nd"),
            TX.stopword_count(F.col("text")).alias("stop"),
        ).collect()
    }
    assert out[0]["n"] == 9 and out[0]["nd"] == 8  # 'the' twice
    assert out[0]["stop"] == 2  # the, the
    assert out[5]["n"] == 1 and out[5]["nd"] == 1 and out[5]["stop"] == 0


def test_bpe_token_count_matches_python_regex(spark, docs):
    import re

    pat = re.compile(TX.BPE_PRETOKEN_PATTERN)
    out = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", TX.bpe_token_count(F.col("text")).alias("n")
        ).collect()
    }
    for r in docs.collect():
        assert out[r["doc_id"]] == len(pat.findall(r["text"])), r["text"]
    # contractions and punctuation split as the pre-tokenizer does
    extra = spark.createDataFrame(
        [(100, "it's a test, isn't it? 42 times!")], "doc_id long, text string"
    )
    n = extra.select(TX.bpe_token_count(F.col("text")).alias("n")).first()["n"]
    assert n == len(pat.findall("it's a test, isn't it? 42 times!"))


def test_quality_score_bounds(spark, docs):
    vals = [r[0] for r in docs.select(TX.quality_score(F.col("text"))).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_lang_id(spark, docs):
    out = {
        r["doc_id"]: r["lang"]
        for r in docs.select(
            "doc_id", TX.predicted_lang(F.col("text")).alias("lang")
        ).collect()
    }
    assert out[0] == "en"
    assert out[2] == "de"
    assert out[5] == "und"  # no stopword hit at all


def test_fingerprint_matches_python(spark, docs):
    def py_fp(text):
        toks = text.strip().split()
        return sum(
            (int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % TX.FINGERPRINT_MOD)
            * (i + 1)
            for i, t in enumerate(toks)
        )

    out = {
        r["doc_id"]: r["fp"]
        for r in docs.select(
            "doc_id", TX.fingerprint(F.col("text")).alias("fp")
        ).collect()
    }
    for r in docs.collect():
        assert out[r["doc_id"]] == py_fp(r["text"])
    # position sensitivity: same multiset, different order -> different fp
    d2 = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta alpha")], "doc_id long, text string"
    )
    fps = [r[0] for r in d2.select(TX.fingerprint(F.col("text"))).collect()]
    assert fps[0] != fps[1]


# ----------------------------------------------------------------- dedup


def test_dedup_exact(spark, docs):
    out = DD.dedup_exact(docs, "doc_id", "text")
    assert out.count() == 5  # 6 docs, one exact-dup pair
    dup = out.filter(F.col("n_docs") > 1).first()
    assert dup["n_docs"] == 2 and dup["survivor_id"] == 0


def test_jaccard_pairs_ground_truth(spark, docs):
    pairs = rows_set(
        DD.jaccard_pairs(docs, "doc_id", "text", threshold=0.5), ["id_a", "id_b"]
    )
    assert (0, 4) in pairs  # exact dup -> jaccard 1.0
    assert (0, 1) in pairs and (1, 4) in pairs  # near-dups (1 of 9 tokens differ)
    assert all(a < b for a, b in pairs)
    j = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.jaccard_pairs(docs, "doc_id", "text", threshold=0.0).collect()
    }
    assert j[(0, 4)] == 1.0
    # shingle sets of docs 0/1: 7 shingles each, 6 common -> 6/8
    assert j[(0, 1)] == 0.75


def test_minhash_lsh_subset_of_ground_truth(spark, docs):
    truth = rows_set(
        DD.jaccard_pairs(docs, "doc_id", "text", threshold=0.5), ["id_a", "id_b"]
    )
    lsh = rows_set(
        DD.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5), ["id_a", "id_b"]
    )
    assert lsh <= truth
    assert (0, 4) in lsh  # identical docs always collide in every band


def test_simhash_identical_and_pairs(spark, docs):
    sims = {
        r["id"]: r["simhash"] for r in DD.simhash(docs, "doc_id", "text").collect()
    }
    assert sims[0] == sims[4]  # identical text -> identical fingerprint
    pairs = DD.simhash_pairs(docs, "doc_id", "text", max_hamming=2, threshold=0.5)
    got = rows_set(pairs, ["id_a", "id_b", "hamming"])
    assert (0, 4, 0) in got
    truth = rows_set(
        DD.jaccard_pairs(docs, "doc_id", "text", threshold=0.5), ["id_a", "id_b"]
    )
    assert {(a, b) for a, b, _ in got} <= truth


def test_jaccard_max_df_drops_hot_shingles(spark, docs):
    # with every shingle capped out, no pairs survive
    none = DD.jaccard_pairs(docs, "doc_id", "text", threshold=0.0, max_df=0)
    assert none.count() == 0


# ------------------------------------------------------------- similarity


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal(8)
    rows = []
    for i in range(20):
        if i < 3:  # cluster around base
            v = base + 0.01 * rng.standard_normal(8)
        else:
            v = rng.standard_normal(8)
        rows.append((i, [float(x) for x in v.astype(np.float32)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), rows


def _np_cos(a, b):
    a, b = np.array(a, dtype=np.float64), np.array(b, dtype=np.float64)
    return float(a @ b / np.sqrt(a @ a) / np.sqrt(b @ b))


def test_cosine_pairs(spark, vecs):
    df, rows = vecs
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in SIM.cosine_pairs(df, "vec_id", "embedding", threshold=0.9).collect()
    }
    assert set(got) == {(0, 1), (0, 2), (1, 2)}  # the planted cluster
    for (a, b), c in got.items():
        assert math.isclose(c, _np_cos(rows[a][1], rows[b][1]), rel_tol=1e-9)


def test_ann_bruteforce_topk(spark, vecs):
    df, rows = vecs
    out = SIM.ann_bruteforce_topk(
        df, df.filter(F.col("vec_id") == 0), "vec_id", "embedding", k=3
    ).collect()
    got = [(r["rank"], r["neighbor_id"]) for r in sorted(out, key=lambda r: r["rank"])]
    cos = sorted(
        ((_np_cos(rows[0][1], rows[i][1]), i) for i in range(1, 20)),
        key=lambda t: (-t[0], t[1]),
    )
    assert got == [(k + 1, cos[k][1]) for k in range(3)]


def test_ann_lsh_topk_is_bucket_restricted_exact(spark, vecs):
    df, rows = vecs
    out = SIM.ann_lsh_topk(
        df, df.filter(F.col("vec_id") == 0), "vec_id", "embedding", k=3, dim=8
    ).collect()
    # every returned cosine is the exact cosine, ranks are contiguous
    for r in out:
        assert math.isclose(
            r["cosine"], _np_cos(rows[0][1], rows[r["neighbor_id"]][1]), rel_tol=1e-9
        )
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == list(
        range(1, len(out) + 1)
    )
    # the near-identical cluster lands in the query's bucket
    ids = {r["neighbor_id"] for r in out}
    assert {1, 2} <= ids


def test_ann_ivf_topk_is_cell_restricted_exact(spark, vecs):
    df, rows = vecs
    out = SIM.ann_topk_ivf(
        df, df.filter(F.col("vec_id") == 0), "vec_id", "embedding",
        k=3, n_cells=4, nprobe=2, dim=8,
    ).collect()
    # every returned cosine is the exact cosine, ranks contiguous
    for r in out:
        assert math.isclose(
            r["cosine"], _np_cos(rows[0][1], rows[r["neighbor_id"]][1]), rel_tol=1e-9
        )
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == list(
        range(1, len(out) + 1)
    )
    # the near-identical cluster shares the query's nearest cell
    ids = {r["neighbor_id"] for r in out}
    assert {1, 2} <= ids
    # nprobe=2 never yields duplicate (query, neighbor) pairs
    pairs = [(r["query_id"], r["neighbor_id"]) for r in out]
    assert len(pairs) == len(set(pairs))


# ------------------------------------------------------------- multimodal


def test_multimodal_plumbing(spark, docs):
    payload = with_binary_payload(docs, "text")
    meta = payload.select("payload_meta.*", "payload").first()
    assert meta["format"] == "txt"
    assert meta["n_bytes"] == len(meta["payload"])
    feats = {r["doc_id"]: r for r in extract_features(payload, "doc_id").collect()}
    for r in docs.collect():
        raw = r["text"].encode()
        f = feats[r["doc_id"]]
        assert f["n_bytes"] == len(raw)
        assert f["header_hex"] == raw[:8].hex()
        assert f["byte_sum"] == sum(raw) % 2_147_483_648
        assert f["is_ascii"] is True


def test_resize_images_nearest_neighbor_exact(spark):
    import numpy as np
    from pyspark.sql import Row

    from bigquery_delta_plugins_spark.functions.multimodal import resize_images

    img = np.arange(24, dtype=np.uint8).reshape(4, 6)  # 4x6 gradient
    df = spark.createDataFrame(
        [
            Row(
                doc_id=1,
                payload=bytearray(img.tobytes()),
                payload_meta=Row(format="raw8", width=6, height=4),
            )
        ]
    )
    out = resize_images(df, out_h=2, out_w=3).collect()[0]
    ys = (np.arange(2) * 4) // 2
    xs = (np.arange(3) * 6) // 3
    expect = img[np.ix_(ys, xs)]
    assert bytes(out["payload"]) == expect.tobytes()
    assert out["payload_meta"]["width"] == 3 and out["payload_meta"]["height"] == 2


def test_sample_frames_every_nth(spark):
    from pyspark.sql import Row

    from bigquery_delta_plugins_spark.functions.multimodal import sample_frames

    frames = [bytes([i] * 4) for i in range(10)]  # 10 frames x 4 bytes
    df = spark.createDataFrame(
        [Row(doc_id=7, payload=bytearray(b"".join(frames)))]
    )
    out = sorted(
        (r["frame_idx"], bytes(r["frame"]))
        for r in sample_frames(df, frame_bytes=4, every_n=3).collect()
    )
    assert out == [(0, frames[0]), (3, frames[3]), (6, frames[6]), (9, frames[9])]


def test_decode_image_is_stubbed():
    from bigquery_delta_plugins_spark.functions.multimodal import decode_image

    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow unexpectedly present")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG", "png")


def test_incremental_dedup_bloom_exact_under_heavy_false_positives(spark):
    """The bloom is an optimization, never a correctness dependency: with
    a deliberately tiny bitmap (64 bits for 40 history docs -> most new
    docs are bloom-positive) the exact-verify rescue join still yields
    precisely the anti-join result; and with a roomy bitmap the
    definitely-new fraction is substantial (the prefilter actually
    prunes)."""
    from bigquery_delta_plugins_spark.operators.dedup import (
        incremental_dedup_bloom,
    )

    hist = spark.createDataFrame(
        [(i, f"history doc {i}") for i in range(40)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(100 + i, f"history doc {i}") for i in range(0, 20)]  # dups
        + [(200 + i, f"fresh doc {i}") for i in range(25)],    # new
        "doc_id long, text string",
    )
    want = {200 + i for i in range(25)}

    tiny = incremental_dedup_bloom(new, hist, "doc_id", "text",
                                   m_bits=64, k=3)
    assert {r["doc_id"] for r in tiny.collect()} == want

    roomy = incremental_dedup_bloom(new, hist, "doc_id", "text",
                                    m_bits=1 << 16, k=5)
    assert {r["doc_id"] for r in roomy.collect()} == want


def test_deterministic_split_stability(spark):
    """Split assignment is identity-stable: growing the corpus never
    moves an existing document between splits, and the deterministic
    sample returns the same rows on every evaluation."""
    from pyspark.sql import functions as F

    from bigquery_delta_plugins_spark.operators.sampling import (
        assign_split,
        deterministic_sample,
    )

    small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["s"] for r in small.select(
        "doc_id", assign_split(F.col("doc_id")).alias("s")).collect()}
    b = {r["doc_id"]: r["s"] for r in big.select(
        "doc_id", assign_split(F.col("doc_id")).alias("s")).collect()}
    assert all(b[k] == v for k, v in a.items())  # no reassignment
    assert set(b.values()) == {"train", "val", "test"}

    s1 = {r["doc_id"] for r in deterministic_sample(
        big, F.col("doc_id"), 10).collect()}
    s2 = {r["doc_id"] for r in deterministic_sample(
        big, F.col("doc_id"), 10).collect()}
    assert s1 == s2 and 0 < len(s1) < 2000
    # nested percentages: a 5% sample is a subset of the 10% sample
    s3 = {r["doc_id"] for r in deterministic_sample(
        big, F.col("doc_id"), 5).collect()}
    assert s3 <= s1


def test_dedup_stream_drops_cross_batch_duplicates(spark, tmp_path):
    """Streaming exact dedup: a duplicate text arriving in a LATER
    micro-batch (within the watermark) is dropped; distinct texts pass;
    state is hash-keyed and watermark-bounded."""
    import datetime as dt
    import time

    from pyspark.sql import types as T

    from bigquery_delta_plugins_spark.operators.dedup import dedup_stream

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])

    def ts(m):
        return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "alpha", ts(0)), (2, "beta", ts(1))], schema
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.2)
    spark.createDataFrame(
        [(3, "alpha", ts(2)), (4, "gamma", ts(3))], schema  # dup of doc 1
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    q = (
        dedup_stream(stream, "doc_id", "text", "ts")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    time.sleep(0.2)
    got = {(r["doc_id"], r["text"]) for r in spark.read.parquet(out_dir).collect()}
    assert got == {(1, "alpha"), (2, "beta"), (4, "gamma")}


@pytest.mark.parametrize("buckets", [4, 16])
def test_pack_bins_bucket_count_parameterized(spark, buckets):
    """corpus_pack_bins' parallelism knob (optimization r6): the pack is
    oracle-exact at ANY bucket count — verified by independently
    replaying the deterministic spec (md5 bucket/order hashes + greedy
    cumsum) in Python over the returned token counts."""
    from bigquery_delta_plugins_spark.plans.pipeline_queries import (
        PACK_BUDGET,
        corpus_pack_bins,
    )

    out = corpus_pack_bins(spark, "/root/testdata/sf0.01", buckets=buckets).collect()
    assert len(out) > 0

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    rows = [(r["doc_id"], r["n_tokens"], r["bucket"], r["bin_in_bucket"]) for r in out]
    # bucket assignment replays exactly
    assert all(b == h32(str(d)) % buckets for d, _, b, _ in rows)
    # greedy pack replays exactly: per bucket, order by (ord_h, doc_id),
    # cumsum tokens, bin = floor((cum-1)/budget)
    by_bucket: dict = {}
    for d, n, b, bib in rows:
        by_bucket.setdefault(b, []).append((h32(f"pack:{d}"), d, n, bib))
    n_bins = 0
    for b, docs_in in by_bucket.items():
        cum = 0
        for _, _, n, bib in sorted(docs_in):
            cum += n
            assert bib == (cum - 1) // PACK_BUDGET
        n_bins += len({bib for *_, bib in docs_in})
    assert n_bins >= buckets  # every bucket packed at least one bin
