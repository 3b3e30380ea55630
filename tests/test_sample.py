"""Deterministic sampling + shuffle-sharding (pipeline/sample.py)."""

from pyspark.sql import functions as F

from duckdb_vss_spark.pipeline.sample import hash_sample, hash60, shuffle_shards


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_hash_sample_is_partitioning_invariant(spark):
    """The kept set is a pure function of (seed, id): repartitioning the
    input must not change it (df.sample would)."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = _ids(hash_sample(docs, "doc_id", 0.2, seed=11))
    b = _ids(hash_sample(docs.repartition(7), "doc_id", 0.2, seed=11))
    c = _ids(hash_sample(docs.coalesce(1), "doc_id", 0.2, seed=11))
    assert a == b == c and len(a) > 0


def test_hash_sample_fraction_concentrates(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    n = docs.count()
    k = hash_sample(docs, "doc_id", 0.5, seed=3).count()
    # Binomial(n, 0.5): 5 sigma ≈ 5·sqrt(n)/2
    assert abs(k - n / 2) < 5 * (n ** 0.5) / 2 + 1


def test_hash_sample_seeds_differ_and_nest(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    s1 = set(_ids(hash_sample(docs, "doc_id", 0.3, seed=1)))
    s2 = set(_ids(hash_sample(docs, "doc_id", 0.3, seed=2)))
    assert s1 != s2  # different seeds → different (independent) samples
    # smaller fraction at the SAME seed is a strict subset (threshold
    # nesting — lets a pipeline grow a sample without resampling)
    small = set(_ids(hash_sample(docs, "doc_id", 0.1, seed=1)))
    assert small <= s1


def test_shuffle_shards_deterministic_and_balanced(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = shuffle_shards(docs, "doc_id", 8, seed=5).select("doc_id", "shard", "pos")
    again = shuffle_shards(docs.repartition(13), "doc_id", 8, seed=5).select(
        "doc_id", "shard", "pos"
    )
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b
    counts = [r["n"] for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()]
    assert len(counts) == 8
    n = sum(counts)
    assert max(counts) < 2 * n / 8  # uniform routing, no hot shard
    # pos is unique per row → a total order within each shard
    assert out.select("pos").distinct().count() == n


def test_hash60_matches_sql_idiom(spark):
    """The Spark-side hash must equal the oracle idiom
    CAST('0x' || substr(md5(...), 1, 15) AS BIGINT) — pin via DuckDB."""
    import duckdb

    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    got = {
        r["doc_id"]: r["h"]
        for r in df.select("doc_id", hash60("doc_id", 9).alias("h")).collect()
    }
    want = {
        i: duckdb.sql(
            f"SELECT CAST('0x' || substr(md5('9_{i}'), 1, 15) AS BIGINT)"
        ).fetchone()[0]
        for i in range(50)
    }
    assert got == want


def test_stratified_sample_mix_and_monotonicity(spark):
    from duckdb_vss_spark.pipeline.sample import stratified_hash_sample

    df = spark.range(0, 4000).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("g"),
    )
    out = stratified_hash_sample(df, "id", "g", {"en": 0.5, "de": 0.05}, seed=5)
    by_g = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    n_en = df.where(F.col("g") == "en").count()
    n_de = df.where(F.col("g") == "de").count()
    assert abs(by_g.get("en", 0) / n_en - 0.5) < 0.06
    assert abs(by_g.get("de", 0) / n_de - 0.05) < 0.03
    # monotone: raising a fraction strictly extends the kept set
    small = {r["id"] for r in stratified_hash_sample(
        df, "id", "g", {"en": 0.2, "de": 0.05}, seed=5).collect()}
    big = {r["id"] for r in out.collect()}
    assert small <= big
    # default_fraction=0 drops unlisted groups entirely
    only_en = stratified_hash_sample(df, "id", "g", {"en": 0.5}, seed=5)
    assert only_en.where(F.col("g") == "de").count() == 0


def test_stratified_sample_validates_fractions(spark):
    import pytest

    from duckdb_vss_spark.pipeline.sample import stratified_hash_sample

    df = spark.range(5).select(F.col("id"), F.lit("x").alias("g"))
    with pytest.raises(ValueError):
        stratified_hash_sample(df, "id", "g", {"x": 1.5})
    with pytest.raises(ValueError):
        stratified_hash_sample(df, "id", "g", {}, default_fraction=-0.1)


def test_weighted_sample_weights_and_determinism(spark):
    """ES keys: a row's selection odds scale with weight — with one
    dominant-weight row per group it must essentially always survive;
    w<=0 rows are excluded; the draw is partitioning-invariant."""
    from pyspark.sql import functions as F

    from duckdb_vss_spark.pipeline.sample import weighted_sample

    rows = [(i, "g", 1.0 if i else 1e9) for i in range(200)] + [(500, "g", 0.0)]
    df = spark.createDataFrame(rows, "id long, grp string, w double")
    got = {
        r["id"]
        for r in weighted_sample(
            df, "id", F.col("w"), k=5, seed=3, group_col="grp"
        ).collect()
    }
    assert len(got) == 5
    assert 0 in got          # the 1e9-weight row wins a slot
    assert 500 not in got    # zero weight excluded
    # partitioning invariance
    got2 = {
        r["id"]
        for r in weighted_sample(
            df.repartition(7), "id", F.col("w"), k=5, seed=3, group_col="grp"
        ).collect()
    }
    assert got2 == got
    # different seed -> (almost surely) different draw of the unit-weight rows
    got3 = {
        r["id"]
        for r in weighted_sample(
            df, "id", F.col("w"), k=5, seed=4, group_col="grp"
        ).collect()
    }
    assert got3 != got
