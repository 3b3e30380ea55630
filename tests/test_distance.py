"""Distance function semantics vs closed-form values (SURVEY §2.3)."""

import math

import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark.functions import (
    array_cosine_distance,
    array_cosine_similarity,
    array_distance,
    array_distance_sq,
    array_inner_product,
    array_negative_inner_product,
    distance_for_metric,
)


def one_row(spark, a, b):
    return spark.createDataFrame([(a, b)], "a array<float>, b array<float>")


def test_l2_with_sqrt(spark):
    # DuckDB-core convention: array_distance is Euclidean WITH sqrt
    df = one_row(spark, [1.0, 2.0, 3.0], [4.0, 6.0, 8.0])
    r = df.select(
        array_distance("a", "b").alias("d"), array_distance_sq("a", "b").alias("d2")
    ).first()
    assert r["d2"] == pytest.approx(9 + 16 + 25)
    assert r["d"] == pytest.approx(math.sqrt(50))


def test_inner_product_and_negative(spark):
    df = one_row(spark, [1.0, 2.0], [3.0, 4.0])
    r = df.select(
        array_inner_product("a", "b").alias("ip"),
        array_negative_inner_product("a", "b").alias("nip"),
    ).first()
    assert r["ip"] == 11.0 and r["nip"] == -11.0


def test_cosine_identity_vs_orthogonal(spark):
    r = one_row(spark, [1.0, 0.0], [1.0, 0.0]).select(
        array_cosine_similarity("a", "b").alias("s"),
        array_cosine_distance("a", "b").alias("d"),
    ).first()
    assert r["s"] == pytest.approx(1.0) and r["d"] == pytest.approx(0.0)
    r = one_row(spark, [1.0, 0.0], [0.0, 1.0]).select(
        array_cosine_distance("a", "b").alias("d")
    ).first()
    assert r["d"] == pytest.approx(1.0)


def test_cosine_rewrite_equivalence(spark):
    # hnsw_rewrite.test:11-31 — 1.0 - cos_sim(v, q) == cos_dist(v, q)
    df = one_row(spark, [0.8, 0.8, 0.8], [0.2, 0.2, 0.2])
    r = df.select(
        (F.lit(1.0) - array_cosine_similarity("a", "b")).alias("lhs"),
        array_cosine_distance("a", "b").alias("rhs"),
    ).first()
    assert r["lhs"] == r["rhs"]


def test_null_propagates(spark):
    df = spark.createDataFrame([([1.0, 2.0], None)], "a array<float>, b array<float>")
    r = df.select(array_distance("a", "b").alias("d")).first()
    assert r["d"] is None


def test_constant_vector_argument(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], "a array<float>")
    r = df.select(array_distance("a", [0.0, 0.0]).alias("d")).first()
    assert r["d"] == pytest.approx(5.0)


def test_metric_dispatch_names():
    # the six-name surface of §2.1 #10 dispatches through three metrics
    assert distance_for_metric("l2sq") is array_distance
    assert distance_for_metric("cosine") is array_cosine_distance
    assert distance_for_metric("ip") is array_negative_inner_product
    with pytest.raises(ValueError, match="must be one of"):
        distance_for_metric("manhattan")


def test_registered_sql_udfs_vectorized_match_native(spark):
    """VERDICT r6 #7: the SQL-registered distance UDFs must be
    whole-batch numpy kernels that agree with the native Column forms on
    a 10k-row frame and stay within 5x native wall time (the old wrapper
    looped per row inside the pandas UDF)."""
    import time

    import numpy as np

    from duckdb_vss_spark.functions.distance import (
        array_cosine_distance,
        array_cosine_similarity,
        array_distance,
        array_distance_sq,
        array_inner_product,
        array_negative_inner_product,
        register_sql_functions,
    )

    register_sql_functions(spark)
    rng = np.random.default_rng(3)
    rows = [
        (
            [float(x) for x in rng.standard_normal(16)],
            [float(x) for x in rng.standard_normal(16)],
        )
        for _ in range(10_000)
    ]
    rows.append((None, [0.0] * 16))
    df = spark.createDataFrame(rows, "a array<float>, b array<float>").cache()
    df.count()

    native_fns = {
        "array_distance": array_distance,
        "array_distance_sq": array_distance_sq,
        "array_inner_product": array_inner_product,
        "array_negative_inner_product": array_negative_inner_product,
        "array_cosine_similarity": array_cosine_similarity,
        "array_cosine_distance": array_cosine_distance,
    }
    df.createOrReplaceTempView("pairs_10k")
    # warm the python-worker pool once so the 5x bound times the kernel,
    # not worker startup
    spark.sql("SELECT array_distance(a, b) AS d FROM pairs_10k").collect()
    for name, fn in native_fns.items():
        t0 = time.time()
        nat = [r["d"] for r in df.select(fn("a", "b").alias("d")).collect()]
        t_nat = time.time() - t0
        t0 = time.time()
        sql = [
            r["d"]
            for r in spark.sql(f"SELECT {name}(a, b) AS d FROM pairs_10k").collect()
        ]
        t_sql = time.time() - t0
        assert sql[-1] is None and nat[-1] is None  # NULL propagates
        a = np.array(nat[:-1], dtype=np.float64)
        b = np.array(sql[:-1], dtype=np.float64)
        # einsum vs sequential fold: identical up to accumulation-order ulps
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12)
        assert t_sql < 5 * max(t_nat, 0.2), (name, t_sql, t_nat)
    df.unpersist()


def test_size_mismatch_raises_native(spark):
    """ADVICE r8: the native Column path must share the reference's
    array-size-mismatch ERROR (DuckDB's array kernels raise); zip_with
    alone would NULL-pad the shorter array and silently yield NULL."""
    df = one_row(spark, [1.0, 2.0, 3.0], [1.0, 2.0])
    for fn in (
        array_distance,
        array_distance_sq,
        array_inner_product,
        array_negative_inner_product,
        array_cosine_similarity,
        array_cosine_distance,
    ):
        with pytest.raises(Exception, match="size mismatch"):
            df.select(fn("a", "b").alias("d")).collect()


def test_size_mismatch_null_input_still_null(spark):
    # NULL on either side short-circuits BEFORE the size guard: NULL in,
    # NULL out — never an error (size(NULL) is -1/NULL, not a mismatch).
    df = spark.createDataFrame(
        [([1.0, 2.0], None), (None, [1.0, 2.0, 3.0]), (None, None)],
        "a array<float>, b array<float>",
    )
    rows = df.select(array_distance("a", "b").alias("d")).collect()
    assert [r["d"] for r in rows] == [None, None, None]


def test_size_mismatch_raises_sql_registered(spark):
    """ADVICE r8: same error behavior through the SQL-registered pandas
    UDFs — the message names the function and both sizes."""
    from duckdb_vss_spark.functions.distance import register_sql_functions

    register_sql_functions(spark)
    one_row(spark, [1.0, 2.0, 3.0], [1.0, 2.0]).createOrReplaceTempView(
        "mm_pairs"
    )
    with pytest.raises(Exception, match="size mismatch"):
        spark.sql("SELECT array_distance(a, b) AS d FROM mm_pairs").collect()


def test_ragged_but_matched_batch(spark):
    """Mixed dims in one batch with per-row matched sizes: the per-dim
    group kernel must compute each row against its own dimensionality,
    on both the native and the SQL-registered path."""
    import numpy as np

    from duckdb_vss_spark.functions.distance import register_sql_functions

    register_sql_functions(spark)
    rows = [
        ([1.0, 2.0], [3.0, 4.0]),
        ([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
        ([2.0], [5.0]),
        (None, [1.0]),
    ]
    df = spark.createDataFrame(rows, "a array<float>, b array<float>")
    df.createOrReplaceTempView("ragged_pairs")
    expect = [
        float(np.sqrt(((np.array(a) - np.array(b)) ** 2).sum()))
        if a is not None and b is not None
        else None
        for a, b in rows
    ]
    nat = [r["d"] for r in df.select(array_distance("a", "b").alias("d")).collect()]
    sql = [
        r["d"]
        for r in spark.sql(
            "SELECT array_distance(a, b) AS d FROM ragged_pairs"
        ).collect()
    ]
    for got in (nat, sql):
        assert got[-1] is None
        np.testing.assert_allclose(got[:-1], expect[:-1], rtol=1e-12)


def test_cosine_zero_and_nan_vectors_match_duckdb(spark):
    """Review r15: DuckDB pins zero-norm and NaN-poisoned cosine
    similarity to -1.0 (distance 2.0). The bare dot/(na*nb) CRASHED
    under Spark 4's default ANSI mode instead (one zero vector killed
    every cosine query). Both entry paths — native Column and the
    SQL-registered kernel — now match the oracle."""
    import math

    import duckdb

    from duckdb_vss_spark.functions.distance import (
        array_cosine_distance,
        array_cosine_similarity,
    )
    from duckdb_vss_spark.functions import register_sql_functions

    cases = [
        ([0.0, 0.0], [1.0, 2.0]),
        ([0.0, 0.0], [0.0, 0.0]),
        ([1.0, 0.0], [0.0, 0.0]),
        ([float("nan"), 1.0], [1.0, 2.0]),
        ([3.0, 4.0], [6.0, 8.0]),
    ]
    df = spark.createDataFrame(cases, "a array<float>, b array<float>")
    got = [
        (r["s"], r["d"])
        for r in df.select(
            array_cosine_similarity("a", "b").alias("s"),
            array_cosine_distance("a", "b").alias("d"),
        ).collect()
    ]
    con = duckdb.connect()
    for (a, b), (s, d) in zip(cases, got):
        aa = [0.0 if math.isnan(x) else x for x in a]
        sql_a = f"{aa}::FLOAT[2]" if not any(math.isnan(x) for x in a) else (
            "['nan'::FLOAT, 1.0]::FLOAT[2]"
        )
        want = con.execute(
            f"SELECT array_cosine_similarity({sql_a}, {b}::FLOAT[2])"
        ).fetchone()[0]
        assert s == want, (a, b, s, want)
        assert d == 1.0 - want
    con.close()
    # the SQL-registered kernel path agrees
    register_sql_functions(spark)
    df.createOrReplaceTempView("czv")
    rows = spark.sql(
        "SELECT array_cosine_similarity(a, b) AS s FROM czv"
    ).collect()
    assert [r["s"] for r in rows] == [g[0] for g in got]


def test_nan_element_parity_both_entry_paths_all_six(spark):
    """VERDICT r15 #2: the SQL-registered path must agree with the
    native Column path on NaN-ELEMENT inputs for all six functions.
    The r6-r15 pandas-UDF registration could not: Arrow's from_pandas
    masking turned genuine NaN results into NULL on the SQL path only.
    Now both paths are the same JVM expression (SQL UDFs), so NaN
    results survive as NaN — matching duckdb where this container's
    duckdb defines the function (array_distance / array_inner_product
    → NaN; array_cosine_similarity → -1.0; the negative-ip and
    cosine-distance names don't exist in its catalog, so their
    expected values follow by negation/1-x from the defined pair)."""
    import math

    import duckdb

    from duckdb_vss_spark.functions.distance import (
        array_cosine_distance,
        array_cosine_similarity,
        array_distance,
        array_distance_sq,
        array_inner_product,
        array_negative_inner_product,
        register_sql_functions,
    )

    register_sql_functions(spark)
    nan = float("nan")
    cases = [
        ([nan, 1.0], [1.0, 2.0]),   # NaN element, left
        ([1.0, 2.0], [nan, 0.5]),   # NaN element, right
        ([nan, nan], [nan, nan]),   # fully poisoned
        ([0.0, 0.0], [1.0, 2.0]),   # zero-norm (cosine pin)
        ([3.0, 4.0], [6.0, 8.0]),   # clean control
        (None, [1.0, 2.0]),         # NULL propagates, never NaN-ifies
    ]
    df = spark.createDataFrame(cases, "a array<float>, b array<float>")
    df.createOrReplaceTempView("nan_pairs")
    native_fns = {
        "array_distance": array_distance,
        "array_distance_sq": array_distance_sq,
        "array_inner_product": array_inner_product,
        "array_negative_inner_product": array_negative_inner_product,
        "array_cosine_similarity": array_cosine_similarity,
        "array_cosine_distance": array_cosine_distance,
    }

    def same(x, y):
        if x is None or y is None:
            return x is None and y is None
        if math.isnan(x) or math.isnan(y):
            return math.isnan(x) and math.isnan(y)
        return x == y

    con = duckdb.connect()

    def duck(fn, a, b):
        """Oracle value — DOUBLE[] inputs, the repo-wide oracle
        convention (queries.py docstring): both engines fold in f64, so
        values agree bit-for-bit (FLOAT[n] would run duckdb's f32
        kernel and diverge in the 8th digit)."""
        if a is None or b is None:
            return None
        lit = lambda v: (
            "["
            + ", ".join(
                "'nan'::DOUBLE" if math.isnan(x) else repr(x) for x in v
            )
            + f"]::DOUBLE[{len(v)}]"
        )
        return con.execute(f"SELECT {fn}({lit(a)}, {lit(b)})").fetchone()[0]

    for name, fn in native_fns.items():
        nat = [r["d"] for r in df.select(fn("a", "b").alias("d")).collect()]
        sql = [
            r["d"]
            for r in spark.sql(f"SELECT {name}(a, b) AS d FROM nan_pairs").collect()
        ]
        for i, (x, y) in enumerate(zip(nat, sql)):
            assert same(x, y), (name, i, cases[i], x, y)
        # duckdb oracle where its catalog defines the name (this
        # container's duckdb predates negative_inner_product /
        # cosine_distance)
        if name in ("array_distance", "array_inner_product", "array_cosine_similarity"):
            for i, (a, b) in enumerate(cases):
                want = duck(name, a, b)
                assert same(nat[i], want), (name, i, cases[i], nat[i], want)
        # NaN (not NULL) is the contract for poisoned non-cosine rows
        if name in ("array_distance", "array_distance_sq",
                    "array_inner_product", "array_negative_inner_product"):
            assert all(x is not None and math.isnan(x) for x in nat[:3]), name
        else:  # cosine pair pins poisoned rows to -1.0 / 2.0
            pin = -1.0 if name == "array_cosine_similarity" else 2.0
            assert all(x == pin for x in nat[:3]), (name, nat[:3])
    con.close()


def test_sql_registered_path_is_arrow_vectorized(spark):
    """The SQL-registered functions are Arrow-native UDFs — vectorized
    batch eval, never row-at-a-time pickling. (A fully JVM-side SQL UDF
    registration is off the table: Spark rejects SQL UDFs in Sort
    [UNSUPPORTED_SQL_UDF_USAGE], and ORDER BY array_distance(…) LIMIT k
    is the reference's hot shape — see register_sql_functions.)"""
    from duckdb_vss_spark.functions.distance import register_sql_functions

    register_sql_functions(spark)
    spark.createDataFrame(
        [([1.0, 2.0], [3.0, 4.0])], "a array<float>, b array<float>"
    ).createOrReplaceTempView("jvm_pairs")
    q = spark.sql(
        "SELECT a FROM jvm_pairs ORDER BY array_cosine_distance(a, b) LIMIT 1"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    assert "ArrowEvalPython" in plan
    assert q.count() == 1  # and the Sort usage actually executes
