"""Scale-pattern tests: salted joins equal plain joins; bucketed tables
co-locate joins (no Exchange in the plan) — the SURVEY §2.C4 shuffle-
minimization story, asserted on actual physical plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_tool_bakasura__spark.operators.skew import salted_join, split_hot_keys
from data_ingestion_tool_bakasura__spark.sources.readers import load_table
from tests.conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_orderpriority")
    fact = li.withColumnRenamed("l_orderkey", "k")
    dim = orders.withColumnRenamed("o_orderkey", "k")
    plain = fact.join(dim, "k").groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("s")
    )
    salted = salted_join(fact, dim, "k", num_salts=4).groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_split_hot_keys_partitions_exactly(spark):
    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "value")
    hot, cold, hot_keys = split_hot_keys(ev, "user_id", hot_threshold=100)
    assert hot.count() + cold.count() == ev.count()
    # every hot key really exceeds the threshold, every cold key doesn't
    hk = {r["user_id"] for r in hot_keys.collect()}
    freqs = {r["user_id"]: r["n"] for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert all(freqs[k] > 100 for k in hk)
    assert all(n <= 100 for k, n in freqs.items() if k not in hk)


def test_flagship_plans_hold(spark):
    """Plan-shape regression guard (PLANS.md contract): dimension joins
    stay broadcast, filters stay pushed to the parquet scan."""
    from data_ingestion_tool_bakasura__spark.plans.catalog import QUERIES

    plan_q5 = (
        QUERIES["q_region_revenue"](spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan_q5.count("BroadcastHashJoin") >= 3, plan_q5[:2000]

    plan_fp = (
        QUERIES["q_filter_project"](spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan_fp
    assert "EqualTo(lang,en)" in plan_fp, plan_fp[:2000]


def test_bucketed_join_avoids_shuffle(spark):
    """Both sides bucketed on the join key -> SortMergeJoin with NO
    Exchange above either scan (the co-located-join contract that makes
    repeated 100 TB fact-fact joins affordable). Uses the default
    warehouse dir (warehouse.dir is a static conf); tables dropped after."""
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("li_b")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("ord_b")
    joined = (
        spark.table("li_b")
        .join(spark.table("ord_b"), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("o_totalprice") > 0)
    )
    # disable broadcast so the planner must choose SMJ, then prove the
    # bucketing removed both shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_token_budget_no_single_partition_window(spark):
    """token_budget_select's cumulative sum must be a per-bucket window
    (hash-partitioned exchange), never Exchange SinglePartition — the
    classic global-window scale-killer (VERDICT r01 #3)."""
    from data_ingestion_tool_bakasura__spark.operators.sampling import token_budget_select

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id",
        F.length("text").cast("double").alias("score"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    sel = token_budget_select(docs, "score", "n_tok", budget=5_000, tiebreak_col="doc_id")
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan[:2000]
    assert "hashpartitioning(_tb_bucket" in plan, plan[:2000]

    # values still equal the naive global-order prefix selection
    import itertools

    rows = docs.orderBy(F.desc("score"), "doc_id").collect()
    cum, want = 0, set()
    for r in rows:
        cum += r["n_tok"]
        if cum > 5_000:
            break
        want.add(r["doc_id"])
    got = {r["doc_id"] for r in sel.collect()}
    assert got == want


def test_r6_vector_text_plans_have_no_scale_killers(spark):
    """Plan-shape guard for the round-6 operators: the winnowing and
    sequence-packing windows must be hash-partitioned (never Exchange
    SinglePartition), and the PQ/IVFADC two-stage searches must ship
    their small sides as broadcasts with no shuffled join of two large
    inputs (stage-1 exchanges carry scalar score rows only)."""
    from data_ingestion_tool_bakasura__spark.operators.dedup import winnow_fingerprints
    from data_ingestion_tool_bakasura__spark.operators.sampling import pack_sequences
    from data_ingestion_tool_bakasura__spark.plans.catalog import QUERIES

    docs = load_table(spark, SF_SMOKE, "documents")
    wf = winnow_fingerprints(docs)
    plan = wf._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan[:2000]

    toks = docs.select("doc_id", F.size(F.split("text", " ")).alias("tok"))
    ps = pack_sequences(toks, "tok", capacity=1000, n_buckets=64)
    plan = ps._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan[:2000]
    assert "hashpartitioning(_pk_b" in plan, plan[:2000]

    for qname in ("q_pq_rerank", "q_ivfadc_search"):
        plan = (
            QUERIES[qname](spark, SF_SMOKE)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan, (qname, plan[:2000])
        assert "CartesianProduct" not in plan, (qname, plan[:2000])
        assert "SinglePartition" not in plan, (qname, plan[:2000])


def test_partitioned_write_prunes_directories(spark, tmp_path):
    """Partition pruning proof on the physical layout: a one-day filter
    over a date-partitioned events table must (a) carry the predicate
    as a PartitionFilter, not a data filter, and (b) plan ONLY that
    day's files — the layout contract that turns a 1000-day scan into
    1/1000th of the I/O."""
    from data_ingestion_tool_bakasura__spark.operators.maintenance import (
        write_partitioned,
    )
    from data_ingestion_tool_bakasura__spark.sources.readers import load_table

    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    n_days = ev.select("event_date").distinct().count()
    assert n_days > 1
    p = str(tmp_path / "events_by_day")
    write_partitioned(ev, p, ["event_date"], sort_cols=["ts"])

    table = spark.read.parquet(p)
    one_day = table.select(F.min("event_date")).first()[0]
    q = table.filter(F.col("event_date") == one_day)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "event_date" in plan.split(
        "PartitionFilters"
    )[1][:200], plan[:2000]
    # rows survive the layout round-trip
    want = ev.filter(F.col("event_date") == one_day).count()
    assert q.count() == want
    # I/O-level pruning proof: corrupt a file in a DIFFERENT partition;
    # the pruned one-day query must never touch it (still correct),
    # while an unpruned full scan hits the corruption and fails
    import glob
    import os

    other = [
        f
        for f in glob.glob(f"{p}/event_date=*/*.parquet")
        if f"event_date={one_day}" not in f
    ]
    assert other
    with open(other[0], "wb") as fh:
        fh.write(b"not a parquet file")
    fresh = spark.read.parquet(p)  # re-plan: no cached file listing
    assert fresh.filter(F.col("event_date") == one_day).count() == want
    try:
        fresh.count()
        raised = False
    except Exception:
        raised = True
    assert raised, "full scan should have hit the corrupted partition"


def test_r7_curation_plans_have_no_scale_killers(spark):
    """Plan-shape guard for the round-7 operators.

    - semantic_dedup: exactly ONE corpus scan (the first cut had 3 —
      the whole point of the grouped-map rewrite), one hash exchange
      on the cluster id, no join of two large sides, no
      SinglePartition anywhere.
    - remove_repeated_spans: every window hash-partitioned (gram
      ranking on the hash, island merge on the doc) — never a global
      window; no CartesianProduct.
    - char_trigram_nll: the model join must be a BroadcastHashJoin
      (count table bounded by the trigram domain, not the corpus) and
      the only SinglePartition exchange is the 1-row total normalizer.
    """
    from data_ingestion_tool_bakasura__spark.operators.dedup import (
        remove_repeated_spans,
        semantic_dedup,
    )
    from data_ingestion_tool_bakasura__spark.operators.sampling import char_trigram_nll
    from data_ingestion_tool_bakasura__spark.operators.similarity import (
        pick_seed_centroids,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    emb = load_table(spark, SF_SMOKE, "embeddings")

    sd = semantic_dedup(emb, pick_seed_centroids(emb, 4), eps=0.3)
    plan = sd._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan[:2000]
    assert "SinglePartition" not in plan, plan[:2000]
    assert "hashpartitioning(c_id" in plan, plan[:2000]

    rs = remove_repeated_spans(docs, n=8)
    plan = rs._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "hashpartitioning(_gh" in plan, plan[:2000]

    lm = char_trigram_nll(docs)
    plan = lm._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]
    # the only SinglePartition is the 1-row corpus-total aggregation
    assert plan.count("SinglePartition") <= 1, plan[:2000]


def test_char_trigram_nll_model_join_is_size_gated(spark, monkeypatch):
    """VERDICT r7 #3: the LM model join must not be an unconditional
    broadcast — a multilingual 100 TB corpus can observe 1e7-1e8
    distinct char trigrams. Three contracts:

    - auto gate under the cap -> BroadcastHashJoin (the fast path);
    - auto gate with the cap forced to 0 -> the shuffle-join fallback
      ENGAGES (no broadcast of the model side);
    - both paths produce identical scores.
    """
    from data_ingestion_tool_bakasura__spark.operators import sampling as SP

    docs = load_table(spark, SF_SMOKE, "documents")

    fast = SP.char_trigram_nll(docs)  # auto: fixture domain << cap
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        monkeypatch.setattr(SP, "MODEL_BROADCAST_MAX_KEYS", 0)
        slow = SP.char_trigram_nll(docs)  # auto: cap forces fallback
        plan = slow._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan[:2000]
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), plan[:2000]
        got_slow = {r["doc_id"]: r.asDict() for r in slow.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    got_fast = {r["doc_id"]: r.asDict() for r in fast.collect()}
    assert got_fast == got_slow


def _stacked_python_evals(df) -> list[str]:
    """ArrowEvalPython/BatchEvalPython eval signatures appearing MORE
    THAN ONCE anywhere in the executed plan — the optimizer-duplicated-
    UDF signature (optimization guide §4.4): every row pays the UDF
    twice. Whole-plan occurrence counting (r17 ADVICE: the original
    adjacent-pair check missed a duplicated eval separated by another
    eval node); sound for the frames guarded below because the
    signature includes the argument EXPRESSION IDS, which only a
    pushed-down copy of the same node shares — legitimate cross-branch
    re-evaluation instantiates fresh ids."""
    import collections
    import re

    pat = re.compile(
        r"(?:ArrowEvalPython|BatchEvalPython) \[([a-zA-Z0-9_]+\([^\]]*?\)#\d+)\]"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    counts = collections.Counter(
        m.group(1) for ln in plan.splitlines() if (m := pat.search(ln))
    )
    return [sig for sig, n in counts.items() if n > 1]


def test_no_duplicated_udf_evaluation_r17(spark):
    """r17 optimization regression guard: the three §4.4 duplicated-UDF
    sites stay single-evaluation.

    - perceptual-hash paths: an isNotNull filter on the UDF OUTPUT gets
      pushed below the projection and duplicates the ArrowEvalPython
      node (every payload hashed twice) — the guard must filter the
      input column;
    - chunk_udf: InferFiltersFromGenerate's size(chunks) > 0 predicate
      gets copied below the projection unless the UDF is marked
      non-deterministic (every document chunked twice).
    """
    from data_ingestion_tool_bakasura__spark.multimodal.media import (
        image_hash_index,
        video_fingerprint_index,
    )
    from data_ingestion_tool_bakasura__spark.operators.ingest import chunk_documents

    docs = load_table(spark, SF_SMOKE, "documents")
    imgs = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(F.lit("IMG1|8|8|1|"), F.coalesce("text", F.lit(""))).alias("payload"),
    )
    vids = docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.encode(
            F.concat(F.lit("VID1|10|4|"), F.coalesce("text", F.lit(""))), "UTF-8"
        ).alias("media"),
    )
    assert _stacked_python_evals(image_hash_index(imgs)) == []
    assert _stacked_python_evals(video_fingerprint_index(vids)) == []
    chunks = chunk_documents(docs.limit(50))
    assert _stacked_python_evals(chunks) == []
    # and the null-guard semantics are unchanged: a NULL payload yields
    # no hash row (the input-side filter is equivalent to the old
    # output-side one because the hash is NULL iff its input is NULL)
    one_null = imgs.limit(3).unionByName(
        spark.createDataFrame([(999999, None)], "media_id long, payload string")
    )
    got = image_hash_index(one_null)
    assert got.filter(F.col("media_id") == 999999).count() == 0
    assert got.count() == 3
