"""Round-6 wave-3 operator tests: prefix-filtered Jaccard join
(output invariance + candidate pruning), k-core peeling semantics,
and grid-kNN neighborhood optimality."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _exact_threshold_pairs(spark, num: int, den: int):
    """Independent brute-force shingle-Jaccard threshold join (the
    semantics the prefix-filtered plan must reproduce), accept test in
    exact integers."""
    from etl_neotel_sql_automation_spark.ops.dedup import shingles

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tok = docs.select(
        F.col("doc_id").alias("id"), F.explode(shingles("text", 3)).alias("tok")
    )
    sizes = tok.groupBy("id").agg(F.count("*").alias("sz"))
    a, b = tok.alias("a"), tok.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("szb"))
    return {
        (r["id_a"], r["id_b"])
        for r in inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(
            F.col("n_inter") * den
            >= num * (F.col("sza") + F.col("szb") - F.col("n_inter"))
        )
        .collect()
    }


def test_jaccard_prefix_is_output_invariant(spark):
    """Prefix filtering must be a pure optimization: the prefix-
    filtered threshold join's pair set equals an independently built
    exact quadratic threshold join's (prefix-filtering lemma = no
    false negatives; exact verification = no false positives). The
    accept test is exact integers on both sides, so boundary pairs
    (jaccard exactly 1/2) cannot diverge through float rounding.
    Configuration under test = the registered one (3-gram shingles,
    unblocked)."""
    from etl_neotel_sql_automation_spark.ops.dedup import jaccard_prefix_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        (r["id_a"], r["id_b"])
        for r in jaccard_prefix_pairs(
            docs, block_col=None, num=1, den=2, gram_n=3
        ).collect()
    }
    want = _exact_threshold_pairs(spark, 1, 2)
    assert got == want and want  # nonempty on this fixture


def test_jaccard_prefix_candidates_prune_versus_full_index(spark):
    """The point of prefix filtering is a SMALLER candidate set than
    the full inverted-index join. Rebuild both candidate sets the way
    the operator does and assert strict pruning — if the prefix filter
    ever stops pruning, the operator silently degenerates to the
    quadratic plan it exists to avoid."""
    from pyspark.sql import Window as W

    from etl_neotel_sql_automation_spark.ops.dedup import shingles

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tok = docs.select(
        F.col("doc_id").alias("id"), F.explode(shingles("text", 3)).alias("tok")
    )
    dfreq = tok.groupBy("tok").agg(F.count("*").alias("dfreq"))
    order = W.partitionBy("id").orderBy(F.col("dfreq").asc(), F.col("tok").asc())
    pos = tok.join(dfreq, "tok").select(
        "id",
        "tok",
        F.row_number().over(order).alias("rn"),
        F.count("*").over(W.partitionBy("id")).alias("sz"),
    )
    pref = pos.filter(F.col("rn") <= F.col("sz") - F.expr("(sz + 1) div 2") + 1)

    def n_pairs(frame):
        x, y = frame.alias("x"), frame.alias("y")
        return (
            x.join(
                y,
                (F.col("x.tok") == F.col("y.tok")) & (F.col("x.id") < F.col("y.id")),
            )
            .select(F.col("x.id"), F.col("y.id"))
            .distinct()
            .count()
        )

    full_pairs = n_pairs(pos)
    prefix_pairs = n_pairs(pref)
    assert 0 < prefix_pairs < full_pairs


def test_kcore_peel_cascades_on_known_graph(spark):
    """Pin peeling semantics on a hand-built graph: a triangle
    {1,2,3} with a pendant chain 3-4-5. At k=2 the chain peels over
    TWO rounds (5 first — degree 1 — then 4, whose degree only drops
    below 2 after 5 leaves). This is the cascade a plain degree
    filter cannot express."""
    from etl_neotel_sql_automation_spark.ops.graph import kcore_peel

    und = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    one = {r["id"]: r["core_deg"] for r in kcore_peel(edges, k=2, rounds=1).collect()}
    two = {r["id"]: r["core_deg"] for r in kcore_peel(edges, k=2, rounds=2).collect()}
    three = {r["id"]: r["core_deg"] for r in kcore_peel(edges, k=2, rounds=3).collect()}
    assert set(one) == {1, 2, 3, 4}
    # round 2 drops 4, but 3's reported degree (within round-1
    # survivors) still counts the edge to 4; round 3 re-counts it gone
    assert two == {1: 2, 2: 2, 3: 3}
    assert three == {1: 2, 2: 2, 3: 2}


def test_geo_grid_knn_is_neighborhood_optimal(spark):
    """Every reported nearest supplier must be the true minimum over
    ALL suppliers in the customer's 3x3 cell neighborhood (ties to the
    smaller suppkey) — rebuilt here by brute force. Guards the grid
    join's correctness independent of the DuckDB oracle."""
    from etl_neotel_sql_automation_spark.workload import queries
    from etl_neotel_sql_automation_spark.ops.hashing import py_md5_long

    rows = queries()["geo_grid_knn"](spark, SF).collect()
    assert rows

    cust = spark.read.parquet(f"{SF}/customer.parquet").select("c_custkey").collect()
    supp = spark.read.parquet(f"{SF}/supplier.parquet").select("s_suppkey").collect()
    CELL, LAT, LON = 30_000_000, 180_000_000, 360_000_000
    cpos = {
        r["c_custkey"]: (
            py_md5_long(f"clat|{r['c_custkey']}") % LAT,
            py_md5_long(f"clon|{r['c_custkey']}") % LON,
        )
        for r in cust
    }
    spos = {
        r["s_suppkey"]: (
            py_md5_long(f"slat|{r['s_suppkey']}") % LAT,
            py_md5_long(f"slon|{r['s_suppkey']}") % LON,
        )
        for r in supp
    }
    got = {r["c_custkey"]: (r["nearest_suppkey"], r["dist2"]) for r in rows}
    for ck, (clat, clon) in cpos.items():
        cands = [
            ((slat - clat) ** 2 + (slon - clon) ** 2, sk)
            for sk, (slat, slon) in spos.items()
            if abs(slon // CELL - clon // CELL) <= 1
            and abs(slat // CELL - clat // CELL) <= 1
        ]
        if not cands:
            assert ck not in got
            continue
        d2, sk = min(cands)
        assert got[ck] == (sk, d2)
