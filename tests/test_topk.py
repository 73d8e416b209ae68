"""topk_per_key: the bounded two-phase per-key top-k (operators/topk.py).

Contract: identical output to ``row_number() OVER (PARTITION BY key
ORDER BY val, tie) <= k`` under ANY input partitioning, while never
feeding a whole key's rows through one task — each phase-1 group is
partition-local, the final window ranks ≤ partitions×k rows per key.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from lakeflow.operators.topk import topk_per_key


def _window_truth(df, key, val, tie, k):
    w = Window.partitionBy(key).orderBy(F.asc(val), F.asc(tie))
    return (
        df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(key, tie, val, "rnk")
    )


def test_topk_per_key_matches_window_any_partitioning(spark):
    rows = [
        Row(q=q, i=i, v=(i * 7919 + q * 104729) % 1000)
        for q in range(3)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows)
    truth = {
        tuple(r) for r in _window_truth(df, "q", "v", "i", 7).collect()
    }
    for parts in (1, 5, 32):
        got = {
            tuple(r)
            for r in topk_per_key(
                df.repartition(parts), "q", "v", "i", 7
            ).collect()
        }
        assert got == truth, parts


def test_topk_per_key_ties_on_value_break_by_id(spark):
    # equal values: the tie column decides, same as orderBy(v, i)
    df = spark.createDataFrame(
        [Row(q=1, i=i, v=42) for i in range(20)]
    ).repartition(8)
    got = [
        (r["i"], r["rnk"]) for r in topk_per_key(df, "q", "v", "i", 3).collect()
    ]
    assert sorted(got) == [(0, 1), (1, 2), (2, 3)]


def test_topk_per_key_fewer_rows_than_k(spark):
    df = spark.createDataFrame([Row(q=1, i=1, v=5), Row(q=1, i=2, v=3)])
    got = sorted(
        (r["i"], r["rnk"]) for r in topk_per_key(df, "q", "v", "i", 10).collect()
    )
    assert got == [(1, 2), (2, 1)]


def test_topk_per_key_plan_is_partition_local_heaps(spark):
    # the phase-1 reduction must key on spark_partition_id (no task ever
    # sorts more than one partition's share of one key) and reduce via
    # collect_list heaps; the final Window then ranks the bounded pool
    df = spark.createDataFrame(
        [Row(q=1, i=i, v=i % 97) for i in range(500)]
    ).repartition(8)
    out = topk_per_key(df, "q", "v", "i", 5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "SPARK_PARTITION_ID" in plan.upper(), plan
    assert "collect_list" in plan, plan
    assert "Window" in plan, plan


def test_pq_module_never_windows_the_corpus(spark):
    # regression gate for the round-4 weak finding: pq.py's per-query
    # rankings (ADC shortlist, IVF shortlist, exact rerank) must all go
    # through the bounded two-phase topk_per_key — a per-q_id Window
    # over the scored corpus funnels O(corpus) rows into one task
    import inspect

    import lakeflow.operators.pq as pq

    src = inspect.getsource(pq)
    assert "Window" not in src
    assert "topk_per_key" in src


def test_pq_adc_plan_uses_bounded_heaps(spark):
    from lakeflow.catalog import load_table
    from lakeflow.operators.pq import pq_adc_topk, pq_codebooks

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    books = pq_codebooks(emb, m=4, k_sub=8)
    out = pq_adc_topk(emb, F.col("vec_id") < 3, books, k=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "SPARK_PARTITION_ID" in plan.upper(), plan
    assert "collect_list" in plan, plan


def test_topk_per_key_descending_matches_window(spark):
    rows = [
        Row(q=q, i=i, v=(i * 6271 + q * 31337) % 500)
        for q in range(2)
        for i in range(150)
    ]
    df = spark.createDataFrame(rows)
    w = Window.partitionBy("q").orderBy(F.desc("v"), F.asc("i"))
    truth = {
        tuple(r)
        for r in df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 6)
        .select("q", "i", "v", "rnk")
        .collect()
    }
    for parts in (1, 7):
        got = {
            tuple(r)
            for r in topk_per_key(
                df.repartition(parts), "q", "v", "i", 6, descending=True
            ).collect()
        }
        assert got == truth, parts


def test_similarity_module_never_windows_the_corpus(spark):
    # brute-force / sign-LSH / IVF ANN rank through the bounded
    # two-phase topk_per_key, same contract as operators/pq.py
    import inspect

    import lakeflow.operators.similarity as sim

    src = inspect.getsource(sim)
    assert "Window" not in src
    assert "topk_per_key" in src


def test_bucketed_running_sum_matches_window(spark):
    from lakeflow.operators.prefix import bucketed_running_sum

    rows = [
        Row(g=f"g{q}", i=i, v=(i * 13 + q) % 50 + 1)
        for q in range(3)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows)
    w = (
        Window.partitionBy("g")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    truth = {
        (r["g"], r["i"], r["run"])
        for r in df.withColumn("run", F.sum("v").over(w)).collect()
    }
    for parts, nb in ((1, 4), (8, 32), (16, 7)):
        got = {
            (r["g"], r["i"], r["run"])
            for r in bucketed_running_sum(
                df.repartition(parts), "g", "i", (), "v", n_buckets=nb
            ).collect()
        }
        assert got == truth, (parts, nb)


def test_bucketed_running_sum_tiny_groups(spark):
    # groups smaller than n_buckets: boundary list collapses, still exact
    from lakeflow.operators.prefix import bucketed_running_sum

    df = spark.createDataFrame([Row(g="a", i=1, v=5), Row(g="a", i=2, v=7), Row(g="b", i=1, v=3)])
    got = {
        (r["g"], r["i"], r["run"])
        for r in bucketed_running_sum(df, "g", "i", (), "v").collect()
    }
    assert got == {("a", 1, 5), ("a", 2, 12), ("b", 1, 3)}


def test_packing_and_budget_mix_never_window_whole_group(spark):
    # pack_sequences / token_budget_sample must route their running sums
    # through the bucketed prefix sum, not a per-group ordered window
    import inspect

    import lakeflow.operators.packing as packing
    import lakeflow.operators.sampling as sampling

    assert "bucketed_running_sum" in inspect.getsource(packing)
    src = inspect.getsource(sampling)
    assert "bucketed_running_sum" in src
    assert "Window.partitionBy(group_col)" not in src


def test_bucketed_running_sum_keeps_null_groups(spark):
    # regression: the CDF/offset joins must be NULL-SAFE — a corpus
    # with a null domain/shard must not silently lose those rows (the
    # window form this replaced kept them in their own partition)
    from lakeflow.operators.prefix import bucketed_running_sum

    df = spark.createDataFrame(
        [Row(g="a", i=1, v=5), Row(g=None, i=2, v=7), Row(g=None, i=3, v=2)]
    )
    got = {
        (r["g"], r["i"], r["run"])
        for r in bucketed_running_sum(df, "g", "i", (), "v").collect()
    }
    assert got == {("a", 1, 5), (None, 2, 7), (None, 3, 9)}


def test_auto_buckets_size_switch(spark, tmp_path):
    # n_buckets=None derives the plan from source bytes (VERDICT r5
    # task #5): small parquet -> plain window (1), unknown/in-memory
    # source -> the scale-safe bucketed path; results identical
    from lakeflow.operators.prefix import auto_buckets, bucketed_running_sum

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [Row(g="a", i=1, v=5), Row(g="a", i=2, v=7), Row(g=None, i=3, v=2)]
    ).write.parquet(p)
    df = spark.read.parquet(p)
    assert auto_buckets(df) == 1  # tiny file: single window wins
    mem = spark.createDataFrame([Row(g="a", i=1, v=5)])
    assert auto_buckets(mem) == 32  # unknown size: scale-safe default
    want = {
        (r["g"], r["i"], r["run"])
        for r in bucketed_running_sum(df, "g", "i", (), "v", n_buckets=8).collect()
    }
    got = {
        (r["g"], r["i"], r["run"])
        for r in bucketed_running_sum(df, "g", "i", (), "v").collect()  # auto=1
    }
    assert got == want == {("a", 1, 5), ("a", 2, 12), (None, 3, 2)}
