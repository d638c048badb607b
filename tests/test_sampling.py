"""Deterministic hash sampling / split assignment tests: ops/sampling.py."""

import pytest
from pyspark.sql import functions as F

from docling_spark.ops import sampling


@pytest.fixture(scope="module")
def spark():
    from docling_spark.job import tuned_session

    s = tuned_session(master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_sample_deterministic_and_monotone(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = set(r["doc_id"] for r in sampling.hash_sample(df, "doc_id", 0.3).collect())
    b = set(r["doc_id"] for r in sampling.hash_sample(df, "doc_id", 0.3).collect())
    assert a == b  # same rows every run
    big = set(r["doc_id"] for r in sampling.hash_sample(df, "doc_id", 0.6).collect())
    assert a <= big  # rate increase only ADDS rows (nested samples)
    assert 0.25 < len(a) / 2000 < 0.35  # ~rate


def test_salt_namespaces_draws(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    s1 = set(r["doc_id"] for r in sampling.hash_sample(df, "doc_id", 0.5, salt="a:").collect())
    s2 = set(r["doc_id"] for r in sampling.hash_sample(df, "doc_id", 0.5, salt="b:").collect())
    assert s1 != s2


def test_splits_disjoint_and_stable_under_growth(spark):
    small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    grown = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    s_small = {
        r["doc_id"]: r["split"]
        for r in sampling.assign_splits(small, "doc_id").collect()
    }
    s_grown = {
        r["doc_id"]: r["split"]
        for r in sampling.assign_splits(grown, "doc_id").collect()
    }
    # old docs never migrate when the corpus grows
    assert all(s_grown[d] == s for d, s in s_small.items())
    counts = {}
    for v in s_grown.values():
        counts[v] = counts.get(v, 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_stratified_rates_and_weights(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else ("xx" if i % 3 == 0 else "fr"))
         for i in range(600)],
        "doc_id long, lang string",
    )
    rates = sampling.mix_rates(spark, {"en": 1.0, "fr": 0.25})
    out = sampling.stratified_rates(df, "doc_id", "lang", rates, default_rate=0.0)
    rows = out.collect()
    # en kept fully, weight 1; fr ~quarter, weight 4; unknown xx dropped
    langs = {r["lang"] for r in rows}
    assert "xx" not in langs
    en = [r for r in rows if r["lang"] == "en"]
    fr = [r for r in rows if r["lang"] == "fr"]
    assert len(en) == 300 and all(r["weight"] == 1.0 for r in en)
    assert 0 < len(fr) < 200 and all(r["weight"] == 4.0 for r in fr)


def test_plan_no_shuffle_for_plain_sample(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    plan = (
        sampling.hash_sample(df, "doc_id", 0.5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # scan -> filter only


def test_rebalance_temperature_flattens_and_is_stable(spark):
    """Head stratum gets a lower keep rate than tail strata, rates cap
    at 1.0, and the verdicts don't depend on partitioning (the retry/
    cluster-size determinism the dyadic design exists for)."""
    from docling_spark.ops.sampling import rebalance_temperature

    rows = [(i, "en" if i < 800 else ("de" if i < 900 else "fr"))
            for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = rebalance_temperature(df, "doc_id", "lang", target_total=300)
    rates = {
        r["lang"]: r["rate"]
        for r in out.select("lang", "rate").distinct().collect()
    }
    # sqrt flattening: en (800 docs) sampled harder than de (100) / fr (100)
    assert rates["en"] < rates["de"] == rates["fr"] <= 1.0
    # weight is exactly 1/rate
    w = out.filter("lang = 'en'").select("rate", "weight").first()
    assert w["weight"] == 1.0 / w["rate"]
    # repartitioning must not change a single verdict
    a = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    out2 = rebalance_temperature(
        df.repartition(7, "lang"), "doc_id", "lang", target_total=300
    )
    b = sorted(r["doc_id"] for r in out2.select("doc_id").collect())
    assert a == b
    # generous budget -> every rate saturates at 1.0, nothing dropped
    full = rebalance_temperature(df, "doc_id", "lang", target_total=10**9)
    assert full.count() == 1000
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_epoch_schedule_caps_and_deficits(spark):
    from docling_spark.ops.sampling import epoch_schedule

    # scarce: 10 tokens supply; rich: 1000 tokens supply
    docs = spark.createDataFrame(
        [("scarce", "w " * 9 + "w"), ("rich", "w " * 999 + "w")],
        "source string, text string",
    )
    weights = spark.createDataFrame(
        [("scarce", 3.0), ("rich", 1.0)], "source string, weight double"
    )
    got = {
        r["source"]: r
        for r in epoch_schedule(
            docs, weights, token_budget=400.0, max_epochs=4.0
        ).collect()
    }
    s, r = got["scarce"], got["rich"]
    assert s["n_tokens"] == 10 and r["n_tokens"] == 1000
    assert s["weight_norm"] == 0.75 and r["weight_norm"] == 0.25
    assert s["target_tokens"] == 300.0 and r["target_tokens"] == 100.0
    # scarce would need 30 epochs -> capped at 4, deficit explicit
    assert s["epochs"] == 4.0
    assert s["tokens_served"] == 40.0 and s["token_deficit"] == 260.0
    # rich under-full: fractional epochs, zero deficit
    assert r["epochs"] == 0.1
    assert r["tokens_served"] == 100.0 and r["token_deficit"] == 0.0


def test_shard_plan_conservation_and_determinism(spark):
    from docling_spark.ops.sampling import shard_plan

    docs = spark.createDataFrame(
        [(i, "x" * (100 + i % 7)) for i in range(200)],
        "doc_id long, text string",
    )
    rep = shard_plan(docs, target_bytes=2000.0).collect()
    total = rep[0]["total_bytes"]
    n_shards = rep[0]["n_shards"]
    import math

    assert n_shards == math.ceil(total / 2000.0)
    # conservation: every doc and every byte lands in exactly one shard
    assert sum(r["n_docs"] for r in rep) == 200
    assert sum(r["shard_bytes"] for r in rep) == total
    assert all(0 <= r["shard_id"] < n_shards for r in rep)
    # determinism across parallelism
    rep2 = shard_plan(docs.repartition(13), target_bytes=2000.0).collect()
    key = lambda r: r["shard_id"]
    assert sorted(rep, key=key) == sorted(rep2, key=key)
    # skew is the ratio vs the even share
    for r in rep:
        assert r["skew"] == r["shard_bytes"] / r["expected_bytes"]


def test_shard_plan_single_shard_floor(spark):
    from docling_spark.ops.sampling import shard_plan

    docs = spark.createDataFrame([(1, "tiny")], "doc_id long, text string")
    (r,) = shard_plan(docs, target_bytes=1e9).collect()
    assert r["n_shards"] == 1 and r["shard_id"] == 0 and r["skew"] == 1.0


def test_mix_matrix_shares(spark):
    from docling_spark.ops.sampling import mix_matrix

    rows = [
        ("en", "web", "a b c"),      # 3 tokens
        ("en", "web", "d e"),        # 2
        ("en", "books", "f g h i"),  # 4
        ("de", "web", "j"),          # 1
    ]
    df = spark.createDataFrame(rows, "lang string, source string, text string")
    got = {
        (r["lang"], r["source"]): r for r in mix_matrix(df).collect()
    }
    c = got[("en", "web")]
    assert c["n_docs"] == 2 and c["n_tokens"] == 5
    assert c["share_of_lang"] == 5 / 9
    assert c["share_of_corpus"] == 0.5
    assert got[("de", "web")]["share_of_lang"] == 1.0
    total = sum(r["share_of_corpus"] for r in got.values())
    assert abs(total - 1.0) < 1e-12
