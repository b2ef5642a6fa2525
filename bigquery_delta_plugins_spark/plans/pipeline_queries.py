"""Training-data-pipeline queries over ``documents`` / ``embeddings``
with exact DuckDB oracle SQL.

Each ``(spark, sf_dir) -> DataFrame`` callable here has a matching
ANSI-SQL string in ``ORACLES`` generated from the *same* Python
constants (stopword sets, thresholds, LSH plane matrices, hash recipe),
so the driver's side-by-side DuckDB comparison checks the engine's
values bit-for-bit — including IEEE doubles, which both engines compute
as index-ordered left folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions.multimodal import extract_features, with_binary_payload
from ..operators import dedup as DD
from ..operators import similarity as SIM

# Tunables shared between the Spark plans and the SQL oracles.
SHINGLE_K = 3
JACCARD_THRESHOLD = 0.5
# Stop-shingle document-frequency cap for the exhaustive Jaccard query —
# without it the hottest shingle's inverted-index self-join is quadratic
# on one reducer (the 100 TB blow-up; see operators/dedup.py docstring).
JACCARD_MAX_DF = 64
MINHASH_NUM = 8
MINHASH_BANDS = 4
SIMHASH_MAX_HAMMING = 2
COSINE_THRESHOLD = 0.4
# Sign-LSH bands for the near-dup pair query: 2^4 = 16 buckets — the
# O(n^2) cartesian becomes a bucket equi-join (exact within a bucket).
# Recall tuning (round 3, measured by plans/recall.py on sf0.01): one
# table at 4 planes gives pair recall 0.20 for cosine≈0.4 pairs
# (collision prob q≈0.63 per plane -> q^4≈0.16, matching theory);
# 8 independent tables lift it to 1-(1-q^4)^8 ≈ 0.75.  Same lever for
# the ANN query (its true top-5 neighbors sit near cosine 0.3, q≈0.6 —
# a single 8-plane table measured recall 0.0).  nprobe=4 of 8 IVF cells
# (was 2) lifts IVF recall 0.45 -> ≥0.6.  All knobs are mirrored in the
# generated DuckDB oracles below, so the hash-exact gate still holds.
#
# Round 4: (planes, tables) chosen from a measured recall/wall sweep
# (tools/recall_sweep.py, sf0.1, full table in BENCH/RECALL.md) rather
# than first-clears-the-floor.  Fewer planes + fewer tables dominates
# the round-3 point on BOTH axes for this corpus (q≈0.6 is high, so
# shallow bands collide plenty and extra tables mostly re-find the
# same pairs): ANN (3,8) = recall 0.925 @ 1.17s vs (4,12) 0.90 @
# 2.12s; neardup (3,6) = 0.826 @ 2.74s vs (4,10) 0.859 @ 3.03s with
# 40% fewer hash tables; IVF (8,4) re-confirmed as the knee.
NEARDUP_PLANES = 3
NEARDUP_TABLES = 6
ANN_K = 5
ANN_N_QUERIES = 8
ANN_PLANES = 3
ANN_TABLES = 8
IVF_CELLS = 8
IVF_NPROBE = 4
EMBED_DIM = 64


def _spread(df: DataFrame, key: str) -> DataFrame:
    """Distribute a scan whose split count starves the cluster (guide
    §2.5: "one huge unsplittable file ... repartition immediately after
    the read").  The sf corpus tables are SINGLE-ROW-GROUP parquet
    files, and a row group is parquet's split atom — byte-range splits
    cannot divide it, so every downstream per-row stage (interpreted
    HOF shingling, regex chains, Arrow kernels, Python codecs) runs as
    ONE task regardless of ``maxPartitionBytes``.  Measured at sf1.0:
    text_repetition 12.9 s -> ~1 s class wins across the text/dedup
    suite for a ~15 MB exchange.

    Scale-adaptive, not local-tuned: when the scan already yields at
    least half of ``defaultParallelism`` partitions (any real multi-GB
    table) this is a NO-OP — a 100 TB corpus is never re-shuffled.  The
    repartition key is the deterministic id column, never round-robin:
    retried tasks must reproduce the same row->partition assignment
    (SPARK-38388), and hash-on-id skips round-robin's
    sort-before-repartition of the single input partition."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — spread is an optimization
        return df
    if cur * 2 >= target:
        return df
    return df.repartition(target, F.col(key))


def _fact(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read a fact table with a scale-adaptive split size: target
    ``clamp(file_bytes / defaultParallelism, 16 MB, 128 MB)`` so a
    multi-row-group file splits to the cluster width (the sf1.0
    lineitem is 131 MB / 6 row groups — at the default 128 MB it scans
    as TWO tasks and the partial aggregation runs at 1/16 of the
    machine).  At real scale bytes/parallelism exceeds 128 MB and this
    is exactly the default again (guide §6 — large splits for large
    sequential scans).  Session-conf based because split size cannot be
    set per-read; every fact reader derives it the same way, so the
    setting is deterministic per query."""
    import os as _os

    p = f"{sf_dir}/{table}.parquet"
    try:
        size = (
            _os.path.getsize(p)
            if _os.path.isfile(p)
            else sum(
                _os.path.getsize(_os.path.join(r, n))
                for r, _d, ns in _os.walk(p)
                for n in ns
            )
        )
        target = max(
            16 << 20,
            min(128 << 20, size // spark.sparkContext.defaultParallelism),
        )
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(target))
    except OSError:
        pass
    return spark.read.parquet(p)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark.read.parquet(f"{sf_dir}/embeddings.parquet"), "vec_id")


# --------------------------------------------------------------- text stats


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = F.col("text")
    n = TX.token_count(t)
    return _docs(spark, sf_dir).select(
        "doc_id",
        n.alias("n_tokens"),
        TX.bpe_token_count(t).alias("n_bpe_tokens"),
        TX.distinct_token_count(t).alias("n_distinct"),
        TX.char_count(t).alias("n_chars_calc"),
        (TX.token_len_sum(t) / n).alias("avg_token_len"),
        (TX.stopword_count(t) / n).alias("stopword_ratio"),
        TX.quality_score(t).alias("quality"),
    )


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):
    the fraction of bigram mass held by the single most frequent bigram
    and the fraction of trigram occurrences whose trigram repeats.
    Boilerplate / SEO-spam pages spike on both; a 100 TB pre-train
    filter thresholds them.

    Scale shape: one tagged explode of (n, gram) rows, two hash
    aggregations keyed by doc — both partial-aggregated map-side — and
    a final per-doc pivot-free conditional agg.  No Python, no windows,
    no skew risk beyond doc length (bounded by the corpus schema)."""
    # bind tokens to a real column: a lambda referencing the raw
    # split(...) expression re-evaluates the split PER ELEMENT inside
    # the n-gram transform (measured 13.2s -> 0.8s at sf0.1); element_at over a bound attribute is O(1)
    docs = _docs(spark, sf_dir).withColumn("_toks", TX.tokens(F.col("text")))
    t = F.col("_toks")
    tagged = F.concat(
        F.transform(
            TX.ngram_array(t, 2), lambda g: F.struct(F.lit(2).alias("n"), g.alias("gram"))
        ),
        F.transform(
            TX.ngram_array(t, 3), lambda g: F.struct(F.lit(3).alias("n"), g.alias("gram"))
        ),
    )
    counts = (
        docs.select("doc_id", F.explode(tagged).alias("g"))
        .groupBy("doc_id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per = counts.groupBy("doc_id", "n").agg(
        F.max("c").alias("top"),
        F.sum("c").alias("tot"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias("dup"),
    )
    agg = per.groupBy("doc_id").agg(
        F.max(F.when(F.col("n") == 2, F.col("top"))).alias("top2"),
        F.max(F.when(F.col("n") == 2, F.col("tot"))).alias("tot2"),
        F.max(F.when(F.col("n") == 3, F.col("dup"))).alias("dup3"),
        F.max(F.when(F.col("n") == 3, F.col("tot"))).alias("tot3"),
    )
    return docs.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("tot2") > 0, F.col("top2") / F.col("tot2"))
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
        F.when(F.col("tot3") > 0, F.col("dup3") / F.col("tot3"))
        .otherwise(F.lit(0.0))
        .alias("dup_trigram_frac"),
    )


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the standard pre-train redaction pass.  The
    synthetic corpus carries no PII, so the query deterministically
    injects an email / IPv4 / phone tail keyed on ``doc_id % 4`` (the
    oracle injects the identical tail), then counts and redacts.  Pure
    Catalyst regexp chain; the output carries an md5 of the redacted
    text so the hash compare covers every byte of the redaction."""
    t = F.col("text")
    tail = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"),
                     F.lit("@example.com")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit(" ip 10."), (F.col("doc_id") % 256).cast("string"),
                     F.lit(".0.1")),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit(" call +1 415 555 01"),
                     (F.col("doc_id") % 10).cast("string"),
                     (F.col("doc_id") % 10).cast("string")),
        )
        .otherwise(F.lit(""))
    )
    enriched = F.concat(t, tail)
    return _docs(spark, sf_dir).select(
        "doc_id",
        TX.pii_count(enriched, "EMAIL").alias("n_emails"),
        TX.pii_count(enriched, "IPV4").alias("n_ips"),
        TX.pii_count(enriched, "PHONE").alias("n_phones"),
        F.md5(TX.redact_pii(enriched)).alias("redacted_md5"),
    )


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = F.col("text")
    cols = [F.col("doc_id")]
    cols += [TX.lang_hits(t, lang).alias(f"hits_{lang}") for lang in TX.LANGS]
    cols.append(TX.predicted_lang(t).alias("predicted_lang"))
    return _docs(spark, sf_dir).select(*cols)


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = F.col("text")
    return _docs(spark, sf_dir).select(
        "doc_id",
        TX.token_count(t).alias("n_tokens"),
        TX.fingerprint(t).alias("fingerprint"),
    )


def text_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus diagnostics: exact token-count percentiles
    (integer inputs -> both engines interpolate identically), mean, and
    extremes.  One hash aggregation; the percentile is Spark's exact
    (sort-based) variant, appropriate for per-group diagnostics - at
    100 TB one switches to percentile_approx and drops the oracle claim.
    """
    n = TX.token_count(F.col("text"))
    return (
        _docs(spark, sf_dir)
        .select("lang", n.alias("n"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("percentile(n, 0.5)").alias("p50_tokens"),
            F.expr("percentile(n, 0.95)").alias("p95_tokens"),
            F.avg("n").alias("mean_tokens"),
            F.min("n").alias("min_tokens"),
            F.max("n").alias("max_tokens"),
        )
    )


# -------------------------------------------------------------------- dedup


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.dedup_exact(_docs(spark, sf_dir), "doc_id", "text")


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.jaccard_pairs(
        _docs(spark, sf_dir),
        "doc_id",
        "text",
        k=SHINGLE_K,
        threshold=JACCARD_THRESHOLD,
        max_df=JACCARD_MAX_DF,
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.minhash_lsh_pairs(
        _docs(spark, sf_dir),
        "doc_id",
        "text",
        k=SHINGLE_K,
        num_hashes=MINHASH_NUM,
        bands=MINHASH_BANDS,
        threshold=JACCARD_THRESHOLD,
    )


def dedup_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER assignment (operators/dedup.py::
    near_dup_clusters): verified MinHash pairs -> connected components
    -> (doc_id, cluster_id, cluster_size).  The transitive-closure step
    a curation pipeline applies on top of pairwise near-dup detection —
    keep doc_id == cluster_id, drop the rest."""
    return DD.near_dup_clusters(
        _docs(spark, sf_dir),
        "doc_id",
        "text",
        k=SHINGLE_K,
        num_hashes=MINHASH_NUM,
        bands=MINHASH_BANDS,
        threshold=JACCARD_THRESHOLD,
    )


def dedup_cluster_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adversarial-shape cluster formation (operators/dedup.py::
    connected_components): a diameter-300 chain (templated chain spam /
    mirrored pagination — the shape min-label propagation alone would
    grind on), a 200-member clique (10,000+doc_id, 19,900 edges), and a
    1001-member hub-star (hub 20,000) — in ONE pair graph, so the query
    exercises the large-star/small-star contraction fallback AND big
    flat clusters end-to-end against a recursive-CTE oracle.  The graph
    is synthesized deterministically from doc_ids (fixed caps, so the
    shape — not the corpus size — is what's under test)."""
    ids = _docs(spark, sf_dir).select("doc_id")
    chain = ids.filter(F.col("doc_id") < 300).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    )
    cl = ids.filter(F.col("doc_id") < 200)
    clique = (
        cl.alias("a")
        .join(cl.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            (F.col("a.doc_id") + 10000).alias("id_a"),
            (F.col("b.doc_id") + 10000).alias("id_b"),
        )
    )
    leaves = ids.filter(F.col("doc_id") < 500)
    star = leaves.select(
        F.lit(20000).cast("long").alias("id_a"),
        (F.col("doc_id") + 20001).alias("id_b"),
    ).union(
        leaves.select(
            F.lit(20000).cast("long").alias("id_a"),
            (F.col("doc_id") + 21001).alias("id_b"),
        )
    )
    pairs = chain.union(clique).union(star)
    # label_rounds=2: this graph is KNOWN deep — don't burn the default
    # 8 propagation rounds before the contraction takes over (the
    # default is tuned for the clique-like shape dedup_cluster_assign
    # covers; production callers keep it).
    comp = DD.connected_components(pairs, label_rounds=2)
    w = Window.partitionBy("component")
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.simhash_pairs(
        _docs(spark, sf_dir),
        "doc_id",
        "text",
        k=SHINGLE_K,
        max_hamming=SIMHASH_MAX_HAMMING,
        threshold=JACCARD_THRESHOLD,
    )


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup (nightly crawl vs historical corpus):
    even-doc_id docs are the 'already ingested' history, odd-doc_id docs
    the new crawl; output = new docs whose text is NOT in history.
    Bloom prefilter + exact verify (operators/dedup.py:
    incremental_dedup_bloom) — the oracle is the plain NOT EXISTS, which
    the bloom+rescue plan reproduces bit-for-bit."""
    docs = _docs(spark, sf_dir)
    return DD.incremental_dedup_bloom(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
        "doc_id",
        "text",
        m_bits=1 << 18,
        k=5,
    )


# --------------------------------------------------------------- similarity


def embed_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH-banded near-dup pairs (exact cosine within a bucket).
    The exact all-pairs baseline stays available as
    ``SIM.cosine_pairs`` for sampled audits; as a headline query the
    banded plan replaces the O(n^2) BroadcastNestedLoopJoin."""
    return SIM.cosine_pairs_banded(
        _embs(spark, sf_dir),
        "vec_id",
        "embedding",
        threshold=COSINE_THRESHOLD,
        planes=NEARDUP_PLANES,
        dim=EMBED_DIM,
        n_tables=NEARDUP_TABLES,
    )


def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _embs(spark, sf_dir)
    return SIM.ann_bruteforce_topk(
        e,
        e.filter(F.col("vec_id") < ANN_N_QUERIES),
        "vec_id",
        "embedding",
        k=ANN_K,
        dim=EMBED_DIM,
    )


def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _embs(spark, sf_dir)
    return SIM.ann_topk_ivf(
        e,
        e.filter(F.col("vec_id") < ANN_N_QUERIES),
        "vec_id",
        "embedding",
        k=ANN_K,
        n_cells=IVF_CELLS,
        nprobe=IVF_NPROBE,
        dim=EMBED_DIM,
    )


def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _embs(spark, sf_dir)
    return SIM.ann_lsh_topk(
        e,
        e.filter(F.col("vec_id") < ANN_N_QUERIES),
        "vec_id",
        "embedding",
        k=ANN_K,
        planes=ANN_PLANES,
        dim=EMBED_DIM,
        n_tables=ANN_TABLES,
    )


def corpus_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test corpus split (operators/sampling.py):
    md5-hash-stable per doc_id, never reassigned as the corpus grows, no
    RNG.  Output: per-(lang, split) counts — small, exact, and verifies
    the assignment function byte-for-byte against the SQL twin."""
    from ..operators.sampling import assign_split

    return (
        _docs(spark, sf_dir)
        .select("lang", assign_split(F.col("doc_id")).alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------- event analytics

SESSION_GAP_MIN = 30
TOPK_USERS = 10


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sessionize import sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize(
        ev, "user_id", "ts", gap_minutes=SESSION_GAP_MIN, order_tiebreak="event_id"
    )


def events_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sessionize import topk_by_count

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return topk_by_count(ev, "user_id", TOPK_USERS)


KMV_K = 64  # sketch size: ~1/sqrt(64) ≈ 12% expected relative error


def events_kmv_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable KMV (k-minimum-values) distinct-count sketch per
    event_type (Bar-Yossef et al. 2002): keep the ``KMV_K`` smallest
    md5-hash values of user_id; estimate distinct users as
    ``(k-1)·2^32/(h_k+1)``.  Unlike HLL/theta sketches, KMV is a pure
    deterministic function of the input hashes, so the ESTIMATE itself
    is oracle-checkable bit-for-bit: every arithmetic step is exact
    integer or a single IEEE-754 correctly-rounded double op — no libm.

    Scale shape: the distinct-(group, hash) agg map-side-combines; the
    k smallest per group ride WindowGroupLimit pushdown (each partition
    forwards at most k rows per group — bounded state, and k-min sets
    MERGE across partitions/streams by construction, which is why
    production pipelines checkpoint them per micro-batch).  The
    ``n_exact`` audit column is a second agg off the PERSISTED distinct
    frame (released via the dedup-family epilogue) — at real scale you
    drop it; it exists here to let the oracle grade the estimate."""
    # single-row-group input: spread so the per-row md5 of the partial
    # distinct runs cluster-wide, not inside the one scan task
    ev = _spread(spark.read.parquet(f"{sf_dir}/events.parquet"), "event_id")
    # the hash is salted with the group key: equally valid for a
    # within-group distinct count, and it decorrelates the per-group
    # sketches (the synthetic corpus gives every event_type the same
    # user set — unsalted, all five sketches would be identical draws)
    h = (
        ev.select(
            "event_type",
            TX.hash32(
                F.concat_ws("|", F.col("event_type"),
                            F.col("user_id").cast("string"))
            ).alias("hv"),
        )
        .distinct()
        .persist()
    )
    w = Window.partitionBy("event_type").orderBy(F.col("hv").asc())
    sk = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_sketch"), F.max("hv").alias("h_k"))
    )
    ex = h.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_exact"))
    est = F.when(F.col("n_sketch") < KMV_K, F.col("n_sketch")).otherwise(
        F.floor(
            F.lit(float(KMV_K - 1)) * F.lit(4294967296.0) / (F.col("h_k") + 1)
            + F.lit(0.5)
        )
    ).cast("long")
    result = (
        ex.join(sk, "event_type")
        .withColumn("kmv_estimate", est)
        .withColumn(
            "rel_err_micro",
            F.floor(
                F.abs(F.col("kmv_estimate") - F.col("n_exact")) * 1000000.0
                / F.col("n_exact")
                + F.lit(0.5)
            ).cast("long"),
        )
        .select("event_type", "n_exact", "kmv_estimate", "rel_err_micro")
    )
    return DD._finish(result, [h], eager_release=True)


def events_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 15-min event-time windows with order-independent
    aggregates (operators/windows.py) — the batch twin of the
    watermarked streaming aggregation (windowed_counts_stream, late-data
    bounds covered by tests/test_windows.py)."""
    from ..operators.windows import windowed_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return windowed_counts(ev, "ts", 15)


FUNNEL_STEPS = ["signup", "click", "purchase"]


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (operators/funnel.py): users reaching each depth
    of signup -> click -> purchase as a time-ordered subsequence."""
    from ..operators.funnel import funnel_counts

    # thin to every-11th event: hot users otherwise trivially complete
    # any funnel and the result degenerates to a single depth bucket
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_id") % 11 == 0
    )
    return funnel_counts(ev, "user_id", "event_id", "event_type",
                         FUNNEL_STEPS)


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity week
    (cohort), counted per week-offset of subsequent activity.  Two hash
    aggregations + one join on user - no windows, no self-join over
    events; (user, week) is de-duplicated FIRST so the final count is a
    plain count, never a count-distinct shuffle."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    week = F.floor(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")) / 7
    ).alias("week")
    weeks = ev.select(F.col("user_id"), week).distinct()
    cohort = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weeks.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ------------------------------------------------------ star-schema analytics


def tpch_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary over the provided lineitem table.
    Money flows through DETERMINISTIC integer cents
    (``floor(x*100 + 0.5)`` — the IEEE expression is evaluated
    identically by any engine, and BIGINT sums are order-independent),
    so the oracle compare is exact where naive double sums would drift
    with partition order.  Pure partial-agg groupBy; at 100 TB this is
    one map-side-combined shuffle of 4 tiny groups."""
    li = _fact(spark, sf_dir, "lineitem")
    cents = lambda c: F.floor(c * 100 + F.lit(0.5)).cast("long")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(cents(disc)).alias("sum_disc_cents"),
            F.sum(cents(charge)).alias("sum_charge_cents"),
        )
    )


def tpch_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-shaped star join: lineitem |x| orders |x| customer |x| nation
    |x| region, revenue per nation for orders from 1995 onward.  The
    dimension chain (customer/nation/region) broadcasts; the date filter
    pushes into the orders scan; revenue is exact integer cents."""
    rd = lambda t: (
        _fact(spark, sf_dir, t) if t in ("lineitem", "orders")
        else spark.read.parquet(f"{sf_dir}/{t}.parquet")
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    orders = rd("orders").filter(
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz")
    )
    dim = (
        rd("customer")
        .join(F.broadcast(rd("nation")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(rd("region")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        rd("lineitem")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(cents).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def tpch_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-shaped profit rollup: lineitem |x| part |x| supplier |x|
    nation, profit per (nation, order year) for one part brand.  Covers
    the remaining provided tables (part, supplier); profit = revenue
    minus retail cost, both as deterministic integer cents.  Brand
    filter pushes into the part scan, which then broadcasts."""
    rd = lambda t: (
        _fact(spark, sf_dir, t) if t in ("lineitem", "orders")
        else spark.read.parquet(f"{sf_dir}/{t}.parquet")
    )
    li = rd("lineitem")
    part = rd("part").filter(F.col("p_brand") == "Brand#1").select(
        "p_partkey", "p_retailprice"
    )
    sup = (
        rd("supplier")
        .join(F.broadcast(rd("nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    orders = rd("orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    profit = F.floor(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.col("p_retailprice") * F.col("l_quantity")
        ) * 100
        + F.lit(0.5)
    ).cast("long")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name", "o_year")
        .agg(
            F.sum(profit).alias("profit_cents"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def tpch_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-shaped shipping priority: top-10 orders by unshipped revenue
    for one market segment.  The segment-filtered customer dim
    broadcasts; the cutoff date pushes into BOTH fact scans (orders
    before, lineitems after); the top-k compiles to
    TakeOrderedAndProject (per-partition heaps, no global sort
    materialization).  The ORDER BY is a total order — l_orderkey is in
    the group key — so the LIMIT is deterministic and oracle-exact."""
    rd = lambda t: (
        _fact(spark, sf_dir, t) if t in ("lineitem", "orders")
        else spark.read.parquet(f"{sf_dir}/{t}.parquet")
    )
    cutoff = F.lit("1998-06-15").cast("timestamp_ntz")
    cust = (
        rd("customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = rd("orders").filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    return (
        rd("lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(cents).alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def tpch_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shaped conditional rollup: per order-priority class, how many
    lineitems shipped within the window and how many shipped >90 days
    after their order date.  One fact-fact equi-join with the window
    pushed into the lineitem scan; the late/on-time split is a
    SUM(CASE) partial aggregate — one shuffle of 5 tiny groups, no
    second pass."""
    rd = lambda t: (
        _fact(spark, sf_dir, t) if t in ("lineitem", "orders")
        else spark.read.parquet(f"{sf_dir}/{t}.parquet")
    )
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-01-01").cast("timestamp_ntz")
    li = (
        rd("lineitem")
        .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_orderkey", "l_shipdate")
    )
    orders = rd("orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(F.when(late, F.lit(1)).otherwise(F.lit(0))).alias("n_late"),
        )
    )


def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style rule filter: compose the token signals into a
    keep/drop verdict with the FIRST failing rule as the reason, in a
    fixed rule order (too_short, too_long, word_len, low_stopword,
    repetitive) — the filtering stage every corpus pipeline runs before
    dedup.  All signals are the same JVM expressions the stats queries
    use; the ratio arithmetic is long/long → double in both engines so
    the threshold comparisons are bit-identical.  One projection, no
    shuffle: at 100 TB this is a scan-stage verdict column."""
    from ..functions import text as TXF

    docs = _docs(spark, sf_dir)
    t = F.col("text")
    n = TXF.token_count(t)
    awl = TXF.token_len_sum(t) / n
    sr = TXF.stopword_count(t) / n
    ttr = TXF.distinct_token_count(t) / n
    reason = (
        F.when(n < 25, F.lit("too_short"))
        .when(n > 90, F.lit("too_long"))
        .when((awl < 4.0) | (awl > 5.2), F.lit("word_len"))
        .when(sr < 0.02, F.lit("low_stopword"))
        .when(ttr < 0.35, F.lit("repetitive"))
    )
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        reason.isNull().alias("keep"),
        reason.alias("fail_reason"),
    )


DECON_K = 8  # n-gram length for eval-set overlap (8-13 typical in practice)
DECON_BENCH_MOD = 19  # doc_id % 19 == 0 -> deterministic "benchmark" split


def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the standard pre-train pass that tags
    training documents sharing any word ``DECON_K``-gram with an
    evaluation set, so eval answers are not memorized from leaked
    training copies.  The eval set is carved deterministically from the
    corpus itself (``doc_id % DECON_BENCH_MOD == 0`` — no external
    data); output is one row per remaining training doc with the count
    of distinct colliding n-grams and a contaminated flag.

    Scale shape (the part that matters at 100 TB): the benchmark n-gram
    set is bounded by the EVAL suite size (MBs, not corpus-sized), so it
    broadcasts — the training corpus is tokenized ONCE (the (doc, gram)
    explode is persisted and consumed by the bench branch, the training
    branch, and released via the dedup family's eager-checkpoint
    epilogue), its per-doc distinct grams survive a broadcast LEFT SEMI
    join and collapse map-side in the per-doc count (explode preserves
    doc locality, so the partial agg sees ~1 row per doc before the
    shuffle).  The zero-fill join back to the doc list runs against only
    the CONTAMINATED doc ids (usually tiny; AQE picks broadcast at
    runtime — not hinted, because adversarially it can be corpus-sized).
    No reference counterpart; training-data-pipeline scope."""
    docs = _docs(spark, sf_dir).withColumn("_toks", TX.tokens(F.col("text")))
    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(TX.ngram_array(F.col("_toks"), DECON_K))
        ).alias("gram"),
    ).persist()
    is_bench = F.col("doc_id") % DECON_BENCH_MOD == 0
    bench_grams = grams.filter(is_bench).select("gram").distinct()
    hits = (
        grams.filter(~is_bench)
        .join(F.broadcast(bench_grams), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
    )
    n = F.coalesce(F.col("n_contaminated_ngrams"), F.lit(0)).cast("long")
    result = (
        docs.filter(~is_bench)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            n.alias("n_contaminated_ngrams"),
            (n > 0).alias("contaminated"),
        )
    )
    return DD._finish(result, [grams], eager_release=True)


PACK_BUDGET = 512  # tokens per training bin
PACK_BUCKETS = 16  # packing parallelism: bins never cross buckets


def corpus_pack_bins(
    spark: SparkSession, sf_dir: str, *, buckets: int = PACK_BUCKETS
) -> DataFrame:
    """Sequence packing — assign documents to fixed token-budget
    training bins, the batching step every pre-train data loader runs
    so short documents don't waste context-window padding.  Docs are
    hashed into ``PACK_BUCKETS`` buckets and packed GREEDILY in
    deterministic hash order WITHIN each bucket: bin boundaries fall
    where the running token cumsum crosses a ``PACK_BUDGET`` multiple.
    Bins never cross buckets, so the bin id is (bucket, local bin).

    Scale shape: this is the parallel form of an inherently sequential
    greedy pack — a single global pack would need a total-order cumsum
    (one task owns the world); bucketing makes each bucket's window an
    independent partition (`Window.partitionBy(bucket)`), i.e. one
    shuffle and embarrassing parallelism, at the cost of ≤1 underfull
    trailing bin per bucket (bounded waste: buckets × budget tokens).
    ``buckets`` is the parallelism knob and MUST scale with the input:
    at 100 TB set buckets ≈ total-cores × a small multiple (each window
    partition owns corpus/buckets tokens; the waste bound is
    buckets × budget TOKENS — absolute, not a corpus fraction — so
    over-provisioning buckets is nearly free).  The driver query keeps
    the default (16), which its frozen oracle mirrors.
    Docs longer than the budget get a bin of their own (standard
    packing behavior; cumsum semantics keep them deterministic), and a
    doc whose token run crosses a boundary belongs to the bin its run
    ENDS in — so a bin may exceed the budget by less than one doc
    (measured at sf0.1: avg fill 504/512, overflow max +80)."""
    docs = _docs(spark, sf_dir)
    d = docs.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_tokens"),
        (TX.hash32(F.col("doc_id").cast("string")) % buckets).alias("bucket"),
        TX.hash32(F.concat(F.lit("pack:"), F.col("doc_id").cast("string"))).alias(
            "ord_h"
        ),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col("ord_h").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    # bin = index of the budget window the doc's run ENDS in; a doc
    # whose span crosses a boundary belongs to the later bin — integer
    # arithmetic, identical in both engines
    return cum.select(
        "doc_id",
        "bucket",
        "n_tokens",
        F.floor((F.col("cum_tokens") - 1) / PACK_BUDGET).cast("long").alias("bin_in_bucket"),
    )


TFIDF_K = 3  # keywords kept per document


def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction — top-``TFIDF_K`` terms per document,
    the tagging pass corpus curation uses for topic bucketing and
    quality-stratified sampling.  Cross-engine determinism: the float
    score is snapped to an integer micro-score
    (``floor(tf·ln(N/df)·1e6 + 0.5)``) and the per-doc ranking orders
    by that integer with the term string as tie-break, so a last-ulp
    ``ln`` difference between libms cannot flip ranks or hashes —
    *statistically*: a residual boundary flip remains possible when
    ``tf·ln(N/df)·1e6`` lands within one ulp of an exact ``x.5``
    boundary AND the two libms round to opposite sides (probability
    ~2^-40 per score at these magnitudes; make the score a pure
    rational of (tf, df, N) if bit-certainty at any corpus size is
    required).

    Scale shape: the (doc, term) counts partial-aggregate map-side
    (terms of one doc are partition-local after the explode); document
    frequency is a second map-side-combinable agg keyed by term; the
    tf↔df equi-join is term-keyed — the df side is exactly one row per
    term, so hot terms are a 1:N broadcast-shaped skew AQE splits —
    and the final top-k window partitions by doc (group size bounded
    by doc length).  N arrives via a broadcast 1-row cross join, never
    a driver collect.

    tf and df both hang off the (doc, term) counts and Catalyst does
    not reuse the common subtree (verified: no ReusedExchange, AQE on
    or off), so tfc is persisted — one corpus scan + explode instead
    of two — and released via the dedup family's eager-checkpoint
    epilogue (the RESULT is small: ``TFIDF_K`` rows/doc)."""
    docs = _docs(spark, sf_dir).withColumn("_toks", TX.tokens(F.col("text")))
    tfc = (
        docs.select("doc_id", F.explode(F.col("_toks")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    dfc = tfc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.floor(
        F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")) * 1e6
        + F.lit(0.5)
    ).cast("long")
    scored = (
        tfc.join(dfc, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("score_micro", score)
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), F.col("term").asc()
    )
    result = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TFIDF_K)
        .select("doc_id", "term", "tf", "df", "score_micro", "rank")
    )
    return DD._finish(result, [tfc], eager_release=True)


def web_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (functions/url.py) checked per-row against
    an external engine.  Messy URLs are constructed DETERMINISTICALLY
    from (doc_id, source) — upper/lower case mixes, default and
    non-default ports, duplicate/trailing slashes, unsorted query
    params, fragments — with the identical construction mirrored in the
    oracle, so the comparison isolates the canonicalizer.  Pure
    Catalyst projection: at 100 TB this runs inside the scan stage."""
    from ..functions.url import canonicalize_url

    docs = _docs(spark, sf_dir)
    m = F.col("doc_id")
    s = lambda c: c.cast("string")
    url = F.concat(
        F.when(m % 3 == 0, F.lit("HTTPS://"))
        .when(m % 3 == 1, F.lit("http://"))
        .otherwise(F.lit("https://")),
        F.lit("WWW."), F.upper("source"), F.lit(".Example.COM"),
        F.when(m % 4 == 0, F.lit(":443"))
        .when(m % 4 == 1, F.lit(":80"))
        .when(m % 4 == 2, F.lit(":8080"))
        .otherwise(F.lit("")),
        F.lit("/Docs//"), s(m),
        F.when(m % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            m % 2 == 0,
            F.concat(F.lit("?b="), s(m % 7), F.lit("&a=1&c="), s(m % 3)),
        ).otherwise(F.lit("")),
        F.when(m % 6 == 0, F.concat(F.lit("#sec"), s(m))).otherwise(F.lit("")),
    )
    # Two projections, deliberately: passing the construction expression
    # straight into canonicalize_url inlines the ~30-node url tree at
    # each of the canonicalizer's references (guide §7.2 — duplicated
    # subtrees), multiplying codegen size and per-row regex input
    # recomputation.  Materializing ``url`` as a named column keeps one
    # evaluation; CollapseProject leaves the split alone because the
    # alias is non-cheap and multiply-referenced.
    built = docs.select("doc_id", url.alias("url"))
    return built.select(
        "doc_id", "url", canonicalize_url(F.col("url")).alias("canon_url")
    )


def web_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> text extraction (functions/extract.py, the north-rule
    N12 path) checked per-row against an INDEPENDENT regex engine: a
    full html page is built deterministically from each document (a
    title, a script block with quoted junk, a style block, nested body
    tags, ragged newline/indent whitespace), the Arrow-vectorized
    pandas UDF extracts on the Spark side, and the oracle replays the
    identical three-substitution pipeline as DuckDB ``regexp_replace``
    (RE2).  The extractor's regexes are RE2-expressible by design
    (no backreferences, explicit ASCII whitespace class), so the hash
    gate proves vectorized-pandas and RE2 agree byte-for-byte — a
    strictly stronger check than the UDF-vs-scalar-Python sha256 test
    (tests/test_extract.py), which shares Python's ``re`` engine."""
    from ..functions.extract import extract_text_udf

    docs = _docs(spark, sf_dir)
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit('</title><script type="text/javascript">var junk = \''),
        F.md5(F.col("text")),
        F.lit("';</script><style>p { color: red }</style></head>\n<body>\n  <h1>"),
        F.upper(F.col("source")),
        F.lit("</h1>\n  <p>"),
        F.col("text"),
        F.lit("</p>\n</body></html>\n"),
    ).cast("binary")
    return docs.select("doc_id", extract_text_udf(html).alias("extracted"))


# --------------------------------------------------------------- multimodal


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_binary_payload(_docs(spark, sf_dir), "text")
    return extract_features(docs, "doc_id")


# =========================================================== oracle SQL gen

_TOKS = r"toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents)"

_H32 = "(('0x' || substr(md5({x}), 1, 8))::BIGINT)"


def _in_list(words) -> str:
    return ", ".join("'" + w + "'" for w in words)


def _shingles_cte(k: int) -> str:
    return (
        "sh AS (SELECT doc_id AS id, unnest(list_distinct(list_transform("
        f"range(1, greatest(len(t) - {k - 1}, 1) + 1), "
        f"i -> array_to_string(t[i:i+{k - 1}], ' ')))) AS shingle FROM toks)"
    )


def _jaccard_tail(threshold: float, extra_cols: str = "", src: str = "sh") -> str:
    return (
        f"cnt AS (SELECT id, count(*) AS n FROM {src} GROUP BY id)\n"
        "SELECT c.id_a, c.id_b"
        + extra_cols
        + ", c.c / (ca.n + cb.n - c.c) AS jaccard\n"
        "FROM common c JOIN cnt ca ON ca.id = c.id_a JOIN cnt cb ON cb.id = c.id_b\n"
        f"WHERE c.c / (ca.n + cb.n - c.c) >= {threshold}"
    )


def _sql_token_stats() -> str:
    stop = _in_list(TX.ALL_STOPWORDS)
    # DuckDB standard strings keep backslashes literal; only quotes double
    bpe = TX.BPE_PRETOKEN_PATTERN.replace("'", "''")
    return f"""WITH {_TOKS}
SELECT d.doc_id,
  len(t) AS n_tokens,
  len(regexp_extract_all(d.text, '{bpe}')) AS n_bpe_tokens,
  len(list_distinct(t)) AS n_distinct,
  length(d.text) AS n_chars_calc,
  list_aggregate(list_transform(t, x -> length(x)), 'sum') / len(t) AS avg_token_len,
  len(list_filter(t, x -> x IN ({stop}))) / len(t) AS stopword_ratio,
  0.3 * least(1.0, len(t) / 100.0)
    + 0.4 * (len(list_distinct(t)) / len(t))
    + 0.3 * (1.0 - len(list_filter(t, x -> x IN ({stop}))) / len(t)) AS quality
FROM toks JOIN documents d USING (doc_id)"""


def _sql_pii_redact() -> str:
    pats = TX.PII_PATTERNS
    redacted = "text"
    for kind, pat in pats.items():
        redacted = f"regexp_replace({redacted}, '{pat}', '<{kind}>', 'g')"
    return f"""WITH enriched AS (
  SELECT doc_id, text || CASE
    WHEN doc_id % 4 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
    WHEN doc_id % 4 = 1 THEN ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
    WHEN doc_id % 4 = 2 THEN ' call +1 415 555 01'
         || CAST(doc_id % 10 AS VARCHAR) || CAST(doc_id % 10 AS VARCHAR)
    ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
  len(regexp_extract_all(text, '{pats["EMAIL"]}')) AS n_emails,
  len(regexp_extract_all(text, '{pats["IPV4"]}')) AS n_ips,
  len(regexp_extract_all(text, '{pats["PHONE"]}')) AS n_phones,
  md5({redacted}) AS redacted_md5
FROM enriched"""


def _sql_repetition() -> str:
    return f"""WITH {_TOKS},
grams AS (
  SELECT doc_id, n, unnest(g) AS gram FROM (
    SELECT doc_id, 2 AS n,
           CASE WHEN len(t) >= 2
                THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
                ELSE [] END AS g
    FROM toks
    UNION ALL
    SELECT doc_id, 3 AS n,
           CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                ELSE [] END AS g
    FROM toks)
),
counts AS (
  SELECT doc_id, n, gram, COUNT(*) AS c FROM grams GROUP BY doc_id, n, gram
),
per AS (
  SELECT doc_id, n, MAX(c) AS top, SUM(c) AS tot,
         SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
  FROM counts GROUP BY doc_id, n
),
agg AS (
  SELECT doc_id,
         MAX(CASE WHEN n = 2 THEN top END) AS top2,
         MAX(CASE WHEN n = 2 THEN tot END) AS tot2,
         MAX(CASE WHEN n = 3 THEN dup END) AS dup3,
         MAX(CASE WHEN n = 3 THEN tot END) AS tot3
  FROM per GROUP BY doc_id
)
SELECT d.doc_id,
  CASE WHEN tot2 > 0 THEN CAST(top2 AS DOUBLE) / tot2 ELSE 0.0 END AS top_bigram_frac,
  CASE WHEN tot3 > 0 THEN CAST(dup3 AS DOUBLE) / tot3 ELSE 0.0 END AS dup_trigram_frac
FROM documents d LEFT JOIN agg USING (doc_id)"""


def _sql_lang_id() -> str:
    hit_cols = ",\n  ".join(
        f"len(list_filter(t, x -> x IN ({_in_list(TX.STOPWORDS[lang])}))) AS hits_{lang}"
        for lang in TX.LANGS
    )
    g = "greatest(" + ", ".join(f"hits_{lang}" for lang in TX.LANGS) + ")"
    chain = " ".join(
        f"WHEN hits_{lang} = {g} THEN '{lang}'" for lang in TX.LANGS
    )
    return f"""WITH {_TOKS},
hits AS (SELECT doc_id,
  {hit_cols}
FROM toks)
SELECT doc_id, {', '.join(f'hits_{lang}' for lang in TX.LANGS)},
  CASE WHEN {g} = 0 THEN 'und' {chain} ELSE 'und' END AS predicted_lang
FROM hits"""


def _sql_fingerprint() -> str:
    h = _H32.format(x="t[i]")
    return f"""WITH {_TOKS}
SELECT doc_id, len(t) AS n_tokens,
  CAST(list_aggregate(list_transform(range(1, len(t) + 1),
    i -> ({h} % {TX.FINGERPRINT_MOD}) * i), 'sum') AS BIGINT) AS fingerprint
FROM toks"""


def _sql_dedup_exact() -> str:
    return (
        "SELECT md5(text) AS text_md5, min(doc_id) AS survivor_id, "
        "count(*) AS n_docs FROM documents GROUP BY md5(text)"
    )


def _sql_dedup_incremental() -> str:
    return """SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
FROM documents d
WHERE d.doc_id % 2 = 1
  AND NOT EXISTS (SELECT 1 FROM documents h
                  WHERE h.doc_id % 2 = 0 AND h.text = d.text)"""


def _sql_dedup_jaccard() -> str:
    # shf = shingle index minus stop-shingles (document frequency over
    # JACCARD_MAX_DF) — the same guard the Spark plan applies, so the
    # per-doc counts and intersections stay bit-identical.
    return f"""WITH {_TOKS},
{_shingles_cte(SHINGLE_K)},
hot AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > {JACCARD_MAX_DF}),
shf AS (SELECT * FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)),
common AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS c
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2),
{_jaccard_tail(JACCARD_THRESHOLD, src="shf")}"""


def _minhash_cte_body() -> str:
    """Shared CTE chain: tokens -> shingles -> minhash signatures ->
    banded LSH candidates -> per-pair common-shingle counts.  Used by
    the pair oracle (_sql_dedup_minhash) and the cluster oracle
    (_sql_dedup_cluster) so both transliterate ONE generator."""
    r = MINHASH_NUM // MINHASH_BANDS
    mins = ",\n  ".join(
        f"min(md5('{h}:' || shingle)) AS mh_{h}" for h in range(MINHASH_NUM)
    )
    bands = "\n  UNION ALL ".join(
        "SELECT id, {i} AS band_idx, md5({expr}) AS band_val FROM sig".format(
            i=b,
            expr=" || '|' || ".join(f"mh_{b * r + i}" for i in range(r)),
        )
        for b in range(MINHASH_BANDS)
    )
    return f"""{_TOKS},
{_shingles_cte(SHINGLE_K)},
sig AS (SELECT id,
  {mins}
FROM sh GROUP BY id),
banded AS (
  {bands}),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.id < b.id),
common AS (
  SELECT cand.id_a, cand.id_b, count(*) AS c
  FROM cand
  JOIN sh sa ON sa.id = cand.id_a
  JOIN sh sb ON sb.id = cand.id_b AND sa.shingle = sb.shingle
  GROUP BY 1, 2)"""


def _sql_dedup_minhash() -> str:
    return f"""WITH {_minhash_cte_body()},
{_jaccard_tail(JACCARD_THRESHOLD)}"""


def _sql_dedup_cluster() -> str:
    # operators/dedup.py::near_dup_clusters — the transitive closure of
    # the verified MinHash pair graph, as a DuckDB recursive CTE (UNION
    # recursion dedups, so label flow terminates at the fixpoint the
    # Spark min-label loop reaches).
    return f"""WITH RECURSIVE {_minhash_cte_body()},
cnt AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
pairs AS (
  SELECT c.id_a, c.id_b
  FROM common c JOIN cnt ca ON ca.id = c.id_a JOIN cnt cb ON cb.id = c.id_b
  WHERE c.c / (ca.n + cb.n - c.c) >= {JACCARD_THRESHOLD}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs),
reach(id, component) AS (
    SELECT src, src FROM edges
  UNION
    SELECT e.dst, r.component FROM reach r JOIN edges e ON e.src = r.id),
comp AS (SELECT id AS doc_id, min(component) AS cluster_id FROM reach GROUP BY id)
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM comp"""


def _sql_dedup_cluster_deep() -> str:
    # Same synthesized pair graph as dedup_cluster_deep; transitive
    # closure as a recursive CTE.  The WHERE r.component < e.dst prune
    # is exact for MIN-reachability: a label larger than the receiving
    # node can never beat the node's own seed, and the true component
    # min (smaller than every member) is never pruned on any path.
    return """WITH RECURSIVE
chain AS (SELECT doc_id AS id_a, doc_id + 1 AS id_b
          FROM documents WHERE doc_id < 300),
clq AS (SELECT a.doc_id + 10000 AS id_a, b.doc_id + 10000 AS id_b
        FROM documents a JOIN documents b ON a.doc_id < b.doc_id
        WHERE a.doc_id < 200 AND b.doc_id < 200),
star AS (SELECT CAST(20000 AS BIGINT) AS id_a, doc_id + 20001 AS id_b
         FROM documents WHERE doc_id < 500
         UNION ALL
         SELECT CAST(20000 AS BIGINT), doc_id + 21001
         FROM documents WHERE doc_id < 500),
pairs AS (SELECT * FROM chain UNION ALL SELECT * FROM clq
          UNION ALL SELECT * FROM star),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs),
reach(id, component) AS (
    SELECT src, src FROM edges
  UNION
    SELECT e.dst, r.component FROM reach r JOIN edges e ON e.src = r.id
    WHERE r.component < e.dst),
comp AS (SELECT id AS doc_id, min(component) AS cluster_id FROM reach GROUP BY id)
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM comp"""


def _sql_dedup_simhash() -> str:
    # fingerprint over SHINGLES, exactly like the Spark plan (unigram
    # simhash mega-clusters on shared-vocabulary corpora)
    h = _H32.format(x="shingle")
    csums = ",\n  ".join(
        f"sum((h >> {b}) & 1) AS c_{b}" for b in range(DD.SIMHASH_BITS)
    )
    simexpr = " + ".join(
        f"(CASE WHEN c_{b} * 2 > n THEN {1 << b} ELSE 0 END)"
        for b in range(DD.SIMHASH_BITS)
    )
    n_bands = DD.SIMHASH_BITS // DD.SIMHASH_BAND_BITS
    mask = (1 << DD.SIMHASH_BAND_BITS) - 1
    bands = "\n  UNION ALL ".join(
        f"SELECT id, {i} AS band_idx, (simhash >> {i * DD.SIMHASH_BAND_BITS}) & {mask} "
        "AS band_val, simhash FROM sim"
        for i in range(n_bands)
    )
    return f"""WITH {_TOKS},
{_shingles_cte(SHINGLE_K)},
th AS (SELECT id, {h} AS h FROM sh),
bits AS (SELECT id, count(*) AS n,
  {csums}
FROM th GROUP BY id),
sim AS (SELECT id, {simexpr} AS simhash FROM bits),
banded AS (
  {bands}),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         bit_count(xor(a.simhash::BIGINT, b.simhash::BIGINT)) AS hamming
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.id < b.id
  WHERE bit_count(xor(a.simhash::BIGINT, b.simhash::BIGINT)) <= {SIMHASH_MAX_HAMMING}),
common AS (
  SELECT cand.id_a, cand.id_b, any_value(cand.hamming) AS hamming, count(*) AS c
  FROM cand
  JOIN sh sa ON sa.id = cand.id_a
  JOIN sh sb ON sb.id = cand.id_b AND sa.shingle = sb.shingle
  GROUP BY cand.id_a, cand.id_b),
{_jaccard_tail(JACCARD_THRESHOLD, extra_cols=", c.hamming")}"""


_DOT = (
    "list_reduce(list_transform(range(1, {n} + 1), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (x, y) -> x + y)"
)


def _cos_sql(a: str, b: str, n: str = "len({a})") -> str:
    n = n.format(a=a)
    return (
        _DOT.format(a=a, b=b, n=n)
        + " / sqrt(" + _DOT.format(a=a, b=a, n=n) + ")"
        + " / sqrt(" + _DOT.format(a=b, b=b, n=n) + ")"
    )


def _sql_bucket_expr(planes: int, table: int, vec: str) -> str:
    """Sign-LSH bucket id of ``vec`` for one hash table — the SQL twin
    of operators/similarity.py::lsh_bucket over plane_signs(table=t)."""
    terms = []
    for p, row in enumerate(SIM.plane_signs(planes, EMBED_DIM, table=table)):
        arr = "[" + ", ".join(f"{float(s)}" for s in row) + "]"
        d = _DOT.format(a=arr, b=vec, n=str(EMBED_DIM))
        terms.append(f"(CASE WHEN {d} > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(terms)


def _sql_embed_neardup() -> str:
    # Mirrors the multi-table banded Spark plan: same md5-derived
    # hyperplane signs per table, candidates = union of per-table bucket
    # collisions (DISTINCT pair+cosine), exact cosine within a bucket.
    tables = "\n  UNION ALL ".join(
        f"SELECT vec_id, embedding, {t} AS tbl, "
        f"{_sql_bucket_expr(NEARDUP_PLANES, t, 'embedding')} AS bucket "
        "FROM embeddings"
        for t in range(NEARDUP_TABLES)
    )
    cos = _cos_sql("a.embedding", "b.embedding")
    return f"""WITH v AS (
  {tables}),
p AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cosine
  FROM v a JOIN v b ON a.tbl = b.tbl AND a.bucket = b.bucket
    AND a.vec_id < b.vec_id)
SELECT id_a, id_b, cosine FROM p WHERE cosine >= {COSINE_THRESHOLD}"""


def _sql_ann_bruteforce() -> str:
    cos = _cos_sql("q.embedding", "c.embedding")
    return f"""WITH p AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cosine
  FROM embeddings q JOIN embeddings c
    ON q.vec_id < {ANN_N_QUERIES} AND q.vec_id <> c.vec_id),
r AS (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM p)
SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= {ANN_K}"""


def _sql_ann_lsh() -> str:
    # Multi-table sign-LSH: per-table (tbl, bucket) union on both sides,
    # DISTINCT candidate (pair, cosine) rows, then exact-cosine ranking —
    # the SQL twin of similarity.py::ann_lsh_topk(n_tables=ANN_TABLES).
    q_tables = "\n  UNION ALL ".join(
        f"SELECT vec_id AS query_id, embedding AS qv, {t} AS tbl, "
        f"{_sql_bucket_expr(ANN_PLANES, t, 'embedding')} AS bucket "
        f"FROM embeddings WHERE vec_id < {ANN_N_QUERIES}"
        for t in range(ANN_TABLES)
    )
    c_tables = "\n  UNION ALL ".join(
        f"SELECT vec_id AS neighbor_id, embedding AS cv, {t} AS tbl, "
        f"{_sql_bucket_expr(ANN_PLANES, t, 'embedding')} AS bucket "
        "FROM embeddings"
        for t in range(ANN_TABLES)
    )
    cos = _cos_sql("q.qv", "c.cv", n=str(EMBED_DIM))
    return f"""WITH q AS (
  {q_tables}),
c AS (
  {c_tables}),
p AS (
  SELECT DISTINCT q.query_id, c.neighbor_id, {cos} AS cosine
  FROM c JOIN q ON q.tbl = c.tbl AND q.bucket = c.bucket
  WHERE q.query_id <> c.neighbor_id),
r AS (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM p)
SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= {ANN_K}"""


def _sql_ann_ivf() -> str:
    # Generic-nprobe twin of similarity.py::ivf_cells: iterative masked
    # argmax — m_{i} masks cell_{i} out of m_{i-1}, cell_{i+1} is the
    # first-max position of m_{i} (identical tie-break and '-infinity'
    # sentinel as the Spark fold, IEEE-exact).
    signs = SIM.plane_signs(IVF_CELLS, EMBED_DIM)
    dots = []
    for row in signs:
        arr = "[" + ", ".join(f"{float(s)}" for s in row) + "]"
        dots.append(_DOT.format(a=arr, b="embedding", n=str(EMBED_DIM)))
    dots_list = "[" + ", ".join(dots) + "]"
    ctes = [
        f"""v AS (
  SELECT vec_id, embedding, {dots_list} AS dots FROM embeddings)""",
        """a AS (
  SELECT vec_id, embedding, dots,
         list_position(dots, list_aggregate(dots, 'max')) AS cell1
  FROM v)""",
        f"""q1 AS (
  SELECT vec_id AS query_id, embedding AS qv, dots AS m0, cell1
  FROM a WHERE vec_id < {ANN_N_QUERIES})""",
    ]
    for i in range(2, IVF_NPROBE + 1):
        ctes.append(
            f"""q{i} AS (
  SELECT *, list_position(m{i - 1}, list_aggregate(m{i - 1}, 'max')) AS cell{i}
  FROM (SELECT *, list_transform(range(1, {IVF_CELLS} + 1),
          i -> CASE WHEN i = cell{i - 1} THEN '-infinity'::DOUBLE
               ELSE m{i - 2}[i] END) AS m{i - 1}
        FROM q{i - 1}))"""
        )
    last = f"q{IVF_NPROBE}" if IVF_NPROBE > 1 else "q1"
    probes = "\n  UNION ALL ".join(
        f"SELECT query_id, qv, cell{i} AS cell FROM {last}"
        for i in range(1, IVF_NPROBE + 1)
    )
    cos = _cos_sql("probes.qv", "c.cv", n=str(EMBED_DIM))
    ctes.append(f"""probes AS (
  {probes})""")
    ctes.append(
        "c AS (SELECT vec_id AS neighbor_id, embedding AS cv, cell1 AS cell FROM a)"
    )
    ctes.append(f"""p AS (
  SELECT probes.query_id, c.neighbor_id, {cos} AS cosine
  FROM c JOIN probes USING (cell) WHERE probes.query_id <> c.neighbor_id)""")
    ctes.append("""r AS (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM p)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= {ANN_K}"
    )


def _sql_sessionize() -> str:
    return f"""WITH s AS (
  SELECT user_id, ts, event_id,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts > lag(ts) OVER w + INTERVAL {SESSION_GAP_MIN} MINUTE
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s2 AS (
  SELECT user_id, event_id,
    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
      AS session_id
  FROM s)
SELECT user_id, session_id, count(*) AS n_events,
  min(event_id) AS first_event_id, max(event_id) AS last_event_id
FROM s2 GROUP BY user_id, session_id"""


def _sql_corpus_stats() -> str:
    return """WITH t AS (
  SELECT lang, len(regexp_split_to_array(trim(text), '\\s+')) AS n
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
  quantile_cont(n, 0.5) AS p50_tokens,
  quantile_cont(n, 0.95) AS p95_tokens,
  AVG(n) AS mean_tokens,
  MIN(n) AS min_tokens,
  MAX(n) AS max_tokens
FROM t GROUP BY lang"""


def _sql_corpus_split() -> str:
    b = _H32.format(x="CAST(doc_id AS VARCHAR)") + " % 100"
    return f"""SELECT lang,
  CASE WHEN {b} >= 99 THEN 'test'
       WHEN {b} >= 98 THEN 'val'
       ELSE 'train' END AS split,
  COUNT(*) AS n_docs
FROM documents GROUP BY 1, 2"""


def _sql_tpch_q1() -> str:
    return """SELECT l_returnflag, l_linestatus,
  COUNT(*) AS n_rows,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
    AS sum_base_cents,
  CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                AS BIGINT)) AS BIGINT) AS sum_disc_cents,
  CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100
                      + 0.5) AS BIGINT)) AS BIGINT) AS sum_charge_cents
FROM lineitem GROUP BY l_returnflag, l_linestatus"""


def _sql_tpch_q5() -> str:
    return """SELECT r_name, n_name,
  CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                AS BIGINT)) AS BIGINT) AS revenue_cents,
  COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
GROUP BY r_name, n_name"""


def _sql_tpch_q9() -> str:
    return """SELECT n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
  CAST(SUM(CAST(floor((l.l_extendedprice * (1 - l.l_discount)
                       - p.p_retailprice * l.l_quantity) * 100 + 0.5)
                AS BIGINT)) AS BIGINT) AS profit_cents,
  COUNT(*) AS n_lineitems
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#1'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2"""


def _sql_quality_filter() -> str:
    stop = _in_list(TX.ALL_STOPWORDS)
    rules = (
        "CASE WHEN n < 25 THEN 'too_short' "
        "WHEN n > 90 THEN 'too_long' "
        "WHEN awl < 4.0 OR awl > 5.2 THEN 'word_len' "
        "WHEN sr < 0.02 THEN 'low_stopword' "
        "WHEN ttr < 0.35 THEN 'repetitive' END"
    )
    return f"""WITH {_TOKS},
s AS (
  SELECT doc_id, len(t) AS n,
    list_aggregate(list_transform(t, x -> length(x)), 'sum') / len(t) AS awl,
    len(list_filter(t, x -> x IN ({stop}))) / len(t) AS sr,
    len(list_distinct(t)) / len(t) AS ttr
  FROM toks
)
SELECT doc_id, n AS n_tokens,
  ({rules}) IS NULL AS keep,
  {rules} AS fail_reason
FROM s"""


def _sql_decontaminate() -> str:
    # same gram construction as the Spark side: per-doc DISTINCT word
    # 8-grams, docs shorter than K emit none (WHERE len(t) >= K mirrors
    # ngram_array's empty-array-below-n semantics)
    k = DECON_K
    m = DECON_BENCH_MOD
    return f"""WITH {_TOKS},
g AS (SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, len(t) - {k - 1} + 1),
        i -> array_to_string(t[i:i+{k - 1}], ' ')))) AS gram
      FROM toks WHERE len(t) >= {k}),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % {m} = 0),
hits AS (SELECT doc_id, count(*) AS n FROM g
         WHERE doc_id % {m} <> 0 AND gram IN (SELECT gram FROM bench)
         GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated_ngrams,
       coalesce(h.n, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
WHERE d.doc_id % {m} <> 0"""


def _sql_pack_bins() -> str:
    h_bucket = _H32.format(x="CAST(doc_id AS VARCHAR)")
    h_ord = _H32.format(x="'pack:' || CAST(doc_id AS VARCHAR)")
    return f"""WITH {_TOKS},
d AS (
  SELECT doc_id, len(t) AS n_tokens,
    {h_bucket} % {PACK_BUCKETS} AS bucket,
    {h_ord} AS ord_h
  FROM toks),
c AS (
  SELECT doc_id, bucket, n_tokens,
    sum(n_tokens) OVER (PARTITION BY bucket ORDER BY ord_h ASC, doc_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM d)
SELECT doc_id, bucket, n_tokens,
  CAST(floor((cum_tokens - 1) / {PACK_BUDGET}) AS BIGINT) AS bin_in_bucket
FROM c"""


def _sql_tfidf_topk() -> str:
    # identical integer micro-score + (score, term) ranking — see the
    # Spark docstring for why the snap makes libm-ln parity a non-issue
    return f"""WITH {_TOKS},
tfc AS (SELECT doc_id, unnest(t) AS term FROM toks),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tfc GROUP BY 1, 2),
dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, tf, df,
    CAST(floor(tf * ln(CAST(n_docs AS DOUBLE) / df) * 1000000 + 0.5)
         AS BIGINT) AS score_micro
  FROM tf JOIN dfc USING (term) CROSS JOIN n),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score_micro DESC, term ASC) AS rnk
  FROM scored)
SELECT doc_id, term, tf, df, score_micro, CAST(rnk AS BIGINT) AS rank
FROM ranked WHERE rnk <= {TFIDF_K}"""


def _sql_url_canonicalize() -> str:
    # identical messy-URL construction, then the canonicalization rules
    # transliterated to DuckDB RE2 (backrefs \1, explicit 'g' flag where
    # Spark's regexp_replace is implicitly global)
    build = (
        "(CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://' "
        "WHEN doc_id % 3 = 1 THEN 'http://' ELSE 'https://' END) || "
        "'WWW.' || upper(source) || '.Example.COM' || "
        "(CASE WHEN doc_id % 4 = 0 THEN ':443' WHEN doc_id % 4 = 1 THEN ':80' "
        "WHEN doc_id % 4 = 2 THEN ':8080' ELSE '' END) || "
        "'/Docs//' || CAST(doc_id AS VARCHAR) || "
        "(CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) || "
        "(CASE WHEN doc_id % 2 = 0 THEN '?b=' || CAST(doc_id % 7 AS VARCHAR) "
        "|| '&a=1&c=' || CAST(doc_id % 3 AS VARCHAR) ELSE '' END) || "
        "(CASE WHEN doc_id % 6 = 0 THEN '#sec' || CAST(doc_id AS VARCHAR) "
        "ELSE '' END)"
    )
    return rf"""WITH u AS (SELECT doc_id, {build} AS url FROM documents),
s AS (
  SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS no_frag FROM u
),
p AS (
  SELECT doc_id, url,
    regexp_extract(no_frag, '^([^?]*)', 1) AS base,
    regexp_extract(no_frag, '\?(.*)$', 1) AS query
  FROM s
),
q AS (
  SELECT doc_id, url, query,
    regexp_replace(
      regexp_replace(
        lower(regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.\-]*://[^/?]*)', 1)),
        '^(https://.*):443$', '\1'),
      '^(http://.*):80$', '\1') AS authority,
    regexp_replace(
      regexp_replace(
        regexp_replace(base, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?]*', ''),
        '/{{2,}}', '/', 'g'),
      '/+$', '') AS path
  FROM p
)
SELECT doc_id, url,
  authority || path ||
  (CASE WHEN query <> '' THEN
     '?' || array_to_string(list_sort(string_split(query, '&')), '&')
   ELSE '' END) AS canon_url
FROM q"""


def _sql_web_text_extract() -> str:
    # identical html construction, then the extractor's three
    # substitutions replayed on DuckDB's RE2 — same patterns character
    # for character (functions/extract.py keeps them RE2-expressible)
    build = (
        "'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || "
        "'</title><script type=\"text/javascript\">var junk = ''' || "
        "md5(text) || "
        "''';</script><style>p { color: red }</style></head>' || chr(10) || "
        "'<body>' || chr(10) || '  <h1>' || upper(source) || '</h1>' || "
        "chr(10) || '  <p>' || text || '</p>' || chr(10) || "
        "'</body></html>' || chr(10)"
    )
    return rf"""SELECT doc_id,
  trim(
    regexp_replace(
      regexp_replace(
        regexp_replace({build},
          '(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>', ' ', 'g'),
        '(?s)<[^>]+>', ' ', 'g'),
      '[ \t\n\r\f\v]+', ' ', 'g'),
    ' ') AS extracted
FROM documents"""


def _sql_tpch_q3() -> str:
    return """SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
  CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING'
WHERE o.o_orderdate < TIMESTAMP '1998-06-15'
  AND l.l_shipdate > TIMESTAMP '1998-06-15'
GROUP BY 1, 2, 3
ORDER BY revenue_cents DESC, l.l_orderkey ASC
LIMIT 10"""


def _sql_tpch_q12() -> str:
    return """SELECT o.o_orderpriority,
  COUNT(*) AS n_lineitems,
  CAST(SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1"""


def _sql_retention() -> str:
    return """WITH weeks AS (
  SELECT DISTINCT user_id,
    CAST(floor(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7.0)
         AS BIGINT) AS week
  FROM events
),
cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY user_id)
SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,
       COUNT(*) AS n_users
FROM weeks w JOIN cohort c USING (user_id)
GROUP BY 1, 2"""


def _sql_funnel() -> str:
    # independent relational formulation of the same greedy semantics:
    # chained earliest-match MINs
    s1, s2, s3 = FUNNEL_STEPS
    return f"""WITH ev AS (SELECT * FROM events WHERE event_id % 11 = 0),
u AS (SELECT DISTINCT user_id FROM ev),
p1 AS (SELECT user_id, MIN(event_id) AS m FROM ev
       WHERE event_type = '{s1}' GROUP BY user_id),
p2 AS (SELECT e.user_id, MIN(e.event_id) AS m FROM ev e
       JOIN p1 USING (user_id)
       WHERE e.event_type = '{s2}' AND e.event_id > p1.m GROUP BY e.user_id),
p3 AS (SELECT e.user_id, MIN(e.event_id) AS m FROM ev e
       JOIN p2 USING (user_id)
       WHERE e.event_type = '{s3}' AND e.event_id > p2.m GROUP BY e.user_id),
prog AS (
  SELECT u.user_id,
         CASE WHEN p3.m IS NOT NULL THEN 3
              WHEN p2.m IS NOT NULL THEN 2
              WHEN p1.m IS NOT NULL THEN 1
              ELSE 0 END AS steps_reached
  FROM u LEFT JOIN p1 USING (user_id) LEFT JOIN p2 USING (user_id)
         LEFT JOIN p3 USING (user_id)
)
SELECT steps_reached, COUNT(*) AS n_users FROM prog GROUP BY 1"""


def _sql_windowed_counts() -> str:
    # make_timestamp(micros) keeps the window start a NAIVE timestamp,
    # matching Spark's TIMESTAMP_NTZ window bounds (to_timestamp would
    # produce TIMESTAMPTZ and shift under a session zone)
    return """SELECT
  make_timestamp(CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 * 1000000)
    AS window_start,
  COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users,
  MIN(event_id) AS min_event_id,
  MAX(event_id) AS max_event_id
FROM events GROUP BY 1"""


def _sql_topk_users() -> str:
    return (
        "SELECT user_id, count(*) AS n FROM events GROUP BY user_id "
        f"ORDER BY n DESC, user_id ASC LIMIT {TOPK_USERS}"
    )


def _sql_kmv_cardinality() -> str:
    h32 = _H32.format(x="event_type || '|' || CAST(user_id AS VARCHAR)")
    k = KMV_K
    return f"""WITH h AS (
  SELECT DISTINCT event_type, {h32} AS hv FROM events),
ranked AS (
  SELECT event_type, hv, row_number() OVER (
    PARTITION BY event_type ORDER BY hv ASC) AS rn FROM h),
sk AS (SELECT event_type, count(*) AS n_sketch, max(hv) AS h_k
       FROM ranked WHERE rn <= {k} GROUP BY 1),
ex AS (SELECT event_type, count(*) AS n_exact FROM h GROUP BY 1),
j AS (
  SELECT e.event_type, e.n_exact,
    CAST(CASE WHEN s.n_sketch < {k} THEN s.n_sketch
         ELSE floor({k - 1} * 4294967296.0 / (s.h_k + 1) + 0.5)
         END AS BIGINT) AS kmv_estimate
  FROM ex e JOIN sk s USING (event_type))
SELECT event_type, n_exact, kmv_estimate,
  CAST(floor(abs(kmv_estimate - n_exact) * 1000000.0 / n_exact + 0.5)
       AS BIGINT) AS rel_err_micro
FROM j"""


def _sql_multimodal() -> str:
    # NOTE: this oracle uses character functions (substr/ord return
    # codepoints, strlen counts bytes); it equals the engine's BYTE
    # features only because the generated documents corpus is pure ASCII
    # (asserted in tests/test_pipeline_ops.py).  COALESCE covers the
    # empty-document case where list_aggregate yields NULL vs Spark's 0.
    return """SELECT doc_id,
  strlen(text) AS n_bytes,
  lower(hex(substr(text, 1, 8))) AS header_hex,
  CAST(COALESCE(list_aggregate(list_transform(range(1, strlen(text) + 1),
    i -> ord(substr(text, i, 1))), 'sum'), 0) % 2147483648 AS BIGINT) AS byte_sum,
  len(list_filter(range(1, strlen(text) + 1),
    i -> ord(substr(text, i, 1)) >= 128)) = 0 AS is_ascii
FROM documents"""


QUERIES = {
    "text_token_stats": text_token_stats,
    "text_repetition": text_repetition,
    "text_corpus_stats": text_corpus_stats,
    "text_pii_redact": text_pii_redact,
    "text_lang_id": text_lang_id,
    "text_fingerprint": text_fingerprint,
    "text_quality_filter": text_quality_filter,
    "text_decontaminate": text_decontaminate,
    "text_tfidf_topk": text_tfidf_topk,
    "corpus_pack_bins": corpus_pack_bins,
    "web_url_canonicalize": web_url_canonicalize,
    "web_text_extract": web_text_extract,
    "dedup_exact": dedup_exact,
    "dedup_incremental": dedup_incremental,
    "corpus_split_counts": corpus_split_counts,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_cluster_assign": dedup_cluster_assign,
    "dedup_cluster_deep": dedup_cluster_deep,
    "dedup_simhash": dedup_simhash,
    "embed_cosine_neardup": embed_cosine_neardup,
    "ann_topk_bruteforce": ann_topk_bruteforce,
    "ann_topk_lsh": ann_topk_lsh,
    "ann_topk_ivf": ann_topk_ivf,
    "multimodal_features": multimodal_features,
    "events_sessionize": events_sessionize,
    "events_windowed_counts": events_windowed_counts,
    "events_kmv_cardinality": events_kmv_cardinality,
    "events_funnel": events_funnel,
    "events_retention": events_retention,
    "tpch_pricing_summary": tpch_pricing_summary,
    "tpch_revenue_by_nation": tpch_revenue_by_nation,
    "tpch_profit_by_nation": tpch_profit_by_nation,
    "tpch_shipping_priority": tpch_shipping_priority,
    "tpch_late_shipments": tpch_late_shipments,
    "events_topk_users": events_topk_users,
}


def oracles() -> dict[str, str]:
    return {
        "text_token_stats": _sql_token_stats(),
        "text_repetition": _sql_repetition(),
        "text_corpus_stats": _sql_corpus_stats(),
        "text_pii_redact": _sql_pii_redact(),
        "text_lang_id": _sql_lang_id(),
        "text_fingerprint": _sql_fingerprint(),
        "text_quality_filter": _sql_quality_filter(),
        "text_decontaminate": _sql_decontaminate(),
        "text_tfidf_topk": _sql_tfidf_topk(),
        "corpus_pack_bins": _sql_pack_bins(),
        "web_url_canonicalize": _sql_url_canonicalize(),
        "web_text_extract": _sql_web_text_extract(),
        "dedup_exact": _sql_dedup_exact(),
        "dedup_incremental": _sql_dedup_incremental(),
        "corpus_split_counts": _sql_corpus_split(),
        "dedup_ngram_jaccard": _sql_dedup_jaccard(),
        "dedup_minhash_lsh": _sql_dedup_minhash(),
        "dedup_cluster_assign": _sql_dedup_cluster(),
        "dedup_cluster_deep": _sql_dedup_cluster_deep(),
        "dedup_simhash": _sql_dedup_simhash(),
        "embed_cosine_neardup": _sql_embed_neardup(),
        "ann_topk_bruteforce": _sql_ann_bruteforce(),
        "ann_topk_lsh": _sql_ann_lsh(),
        "ann_topk_ivf": _sql_ann_ivf(),
        "multimodal_features": _sql_multimodal(),
        "events_sessionize": _sql_sessionize(),
        "events_windowed_counts": _sql_windowed_counts(),
        "events_kmv_cardinality": _sql_kmv_cardinality(),
        "events_funnel": _sql_funnel(),
        "events_retention": _sql_retention(),
        "tpch_pricing_summary": _sql_tpch_q1(),
        "tpch_revenue_by_nation": _sql_tpch_q5(),
        "tpch_profit_by_nation": _sql_tpch_q9(),
        "tpch_shipping_priority": _sql_tpch_q3(),
        "tpch_late_shipments": _sql_tpch_q12(),
        "events_topk_users": _sql_topk_users(),
    }
