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


def test_events_attribution_semantics(tmp_path, spark):
    """Hand-built events pin the attribution semantics: first/last by
    (ts, event_id), linear = 1000000 div n_touches, 72 h lookback
    inclusive at exactly pts - 72h and exclusive at pts, purchases
    with no in-window touches drop, and the band join finds touches
    in the PREVIOUS 72 h band (the banding's reason to exist)."""
    import datetime as dt

    from etl_neotel_sql_automation_spark.workload import queries

    def ts(s):
        return dt.datetime.fromtimestamp(s, dt.timezone.utc).replace(tzinfo=None)

    LOOK = 259_200
    # band boundary at multiples of LOOK; purchase at LOOK+10 has its
    # window straddling the boundary
    rows = [
        # user 1: two touches then purchase — first ch0, last ch1
        (1, ts(LOOK + 1), 1, "view", 0.0, '{"k": 0}'),
        (2, ts(LOOK + 5), 1, "click", 0.0, '{"k": 1}'),
        (3, ts(LOOK + 10), 1, "purchase", 0.0, '{"k": 9}'),
        # user 2: touch exactly at pts - LOOK (included) in PREVIOUS band
        (4, ts(10), 2, "view", 0.0, '{"k": 2}'),
        (5, ts(LOOK + 10), 2, "purchase", 0.0, '{"k": 9}'),
        # user 3: touch one second too old (excluded) -> purchase drops
        (6, ts(9), 3, "view", 0.0, '{"k": 3}'),
        (7, ts(LOOK + 10), 3, "purchase", 0.0, '{"k": 9}'),
        # user 4: touch AT purchase ts (excluded: strictly before)
        (8, ts(LOOK + 10), 4, "click", 0.0, '{"k": 4}'),
        (9, ts(LOOK + 10), 4, "purchase", 0.0, '{"k": 9}'),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        r["channel"]: (r["n_first"], r["n_last"], r["linear_ppm"])
        for r in queries()["events_attribution"](spark, str(tmp_path)).collect()
    }
    assert got == {
        "ch0": (1, 0, 500000),
        "ch1": (0, 1, 500000),
        "ch2": (1, 1, 1000000),
    }


def test_skyline_matches_bruteforce_dominance(spark):
    """The bucketed prefix-max skyline must equal the quadratic
    dominance definition: keep (x, y) iff no other point has x' >= x,
    y' >= y with at least one strict. Rebuilt here by brute force over
    the collected point set."""
    from etl_neotel_sql_automation_spark.workload import queries
    from pyspark.sql import functions as F

    sf = SF
    s = spark.read.parquet(f"{sf}/supplier.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    pts = (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .groupBy("s_suppkey", "s_acctbal")
        .agg(
            F.expr(
                "CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)"
            ).alias("y")
        )
        .select(
            "s_suppkey",
            F.expr("CAST(round(s_acctbal * 1000000) AS BIGINT)").alias("x"),
            "y",
        )
        .collect()
    )
    xy = [(r["x"], r["y"]) for r in pts]
    want = set()
    for x, y in xy:
        dominated = any(
            (x2 >= x and y2 >= y and (x2 > x or y2 > y)) for x2, y2 in xy
        )
        if not dominated:
            want.add((x, y))
    got = {
        (r["acctbal_micro"], r["revenue_cent"])
        for r in queries()["skyline_suppliers"](spark, sf).collect()
    }
    assert got == want and want


def test_grid_dbscan_labels_are_true_components(spark):
    """Cluster labels must be the exact connected-component fixpoint
    (min cell id per component over 8-adjacency) — rebuilt here with
    union-find over the collected core cells. Guards against the
    fixed-round labeling shortfall the operator explicitly avoids
    (components wider than the round count)."""
    from etl_neotel_sql_automation_spark.workload import queries

    rows = queries()["geo_grid_dbscan"](spark, SF).collect()
    assert rows
    cells = {(r["cx"], r["cy"]): r["cluster"] for r in rows}
    ids = {c: c[0] * 100000 + c[1] for c in cells}
    parent = {c: c for c in cells}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    for (cx, cy) in cells:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nbr = (cx + dx, cy + dy)
                if nbr in cells:
                    ra, rb = find((cx, cy)), find(nbr)
                    if ra != rb:
                        parent[ra] = rb
    comp_min = {}
    for c in cells:
        r = find(c)
        comp_min[r] = min(comp_min.get(r, ids[c]), ids[c])
    for c, lbl in cells.items():
        assert lbl == comp_min[find(c)]


def test_merkle_diff_finds_exactly_the_cdc_changes(spark):
    """The digest pre-filter must lose nothing on this fixture: the
    merkle diff's changed-key set equals the canonical
    cdc_snapshot_diff full-outer result (no false negatives up to the
    ~2^-40 fingerprint-sum collision, which cannot occur on a fixture
    this size)."""
    from etl_neotel_sql_automation_spark.workload import queries

    qs = queries()
    merkle = {
        (r["o_orderkey"], r["change_type"])
        for r in qs["dq_merkle_diff"](spark, SF).collect()
    }
    cdc = {
        (r["o_orderkey"], r["change_type"])
        for r in qs["cdc_snapshot_diff"](spark, SF).collect()
    }
    assert merkle == cdc and cdc
