"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k with the *query* side broadcast —
the corpus scan stays distributed and shuffle-free; per-row work is a
codegen'd higher-order-function dot product (no Python).

Scale path: LSH bucketing (random hyperplane signs) cuts candidates to
one bucket's worth before the exact re-rank — same shape as the
MinHash-LSH dedup pipeline: explode-to-buckets, equi-join, re-rank.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _to_double(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def _fan_out(df: DataFrame) -> DataFrame:
    """Parallelize a corpus scan that arrived as too few partitions
    (small parquet). No-op for well-partitioned inputs at scale."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two float-array columns, computed in double."""
    a, b = _to_double(a), _to_double(b)
    return dot(a, b) / (norm(a) * norm(b))


def cosine_to_fixed_pandas(query_vec: list[float], vec_col: str = "embedding"):
    """Arrow-vectorized cosine against ONE fixed query vector: a
    numpy-matrix Pandas UDF.

    Measured (100k x 64-dim, local[32], warm): HOF expression ~0.3-0.8s,
    pandas UDF ~0.3-0.5s after a ~5s Python-worker warmup — Arrow
    transfer of the array column roughly cancels the numpy win at this
    width, so the JVM-side expression stays the default (no Python
    worker dependency). This alternative exists for fatter per-row math
    (e.g. 1k+-dim vectors or matrix ops), where the batch-matrix
    multiply pulls ahead. Numbers via tools/scale_probe.py.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)

    # no type annotations: under `from __future__ import annotations`
    # the hint strings reference the locally-imported pd and the UDF
    # type-hint inferrer cannot resolve them; the explicit returnType
    # carries the typing instead
    def cos(s):
        m = np.asarray(s.to_list(), dtype=np.float64)  # (batch, dim)
        dots = m @ q
        norms = np.linalg.norm(m, axis=1) * qn
        return pd.Series(dots / norms)

    cos_udf = F.pandas_udf(cos, returnType=T.DoubleType())
    return cos_udf(F.col(vec_col))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × distributed corpus scan.

    Output: q_id, n_id, rank (1..k), sim. Self-matches excluded. Rank
    ties broken by neighbor id so results are deterministic.
    """
    # Double-cast and norm are factored out to ONCE per row on each side
    # of the join (they sat inside cosine() before, re-evaluated for
    # every (query, corpus) pair — 2 array casts + 2 norm folds x |q|
    # per corpus row). The per-pair work left is one zip_with/aggregate
    # dot product + a divide. Arithmetic is bit-identical: same
    # sequential fold order, and IEEE multiply/divide are exact given
    # the same operands, so the round-6 oracle comparison is unaffected.
    q = queries.select(
        F.col(id_col).alias("q_id"), _to_double(F.col(vec_col)).alias("q_vec")
    ).withColumn("q_norm", norm(F.col("q_vec")))
    c = (
        _fan_out(corpus)
        .select(F.col(id_col).alias("n_id"), _to_double(F.col(vec_col)).alias("n_vec"))
        .withColumn("n_norm", norm(F.col("n_vec")))
    )
    scored = c.join(F.broadcast(q), F.col("q_id") != F.col("n_id")).select(
        "q_id",
        "n_id",
        F.round(
            dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_norm") * F.col("n_norm")), 6
        ).alias("sim"),
    )
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), "n_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "sim")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 8,
    seed: int = 42,
) -> DataFrame:
    """IVF-style ANN: k-means coarse quantizer (pyspark.ml, deterministic
    seed), corpus partitioned by nearest centroid, each query probing its
    ``n_probe`` nearest centroids, exact cosine re-rank inside the probed
    cells.

    Scale shape: centroid assignment is a broadcast of ``n_centroids``
    vectors (tiny); the candidate join is an equi-join on centroid id —
    the cross join is gone, recall is tunable via ``n_probe``
    (measured on the sf0.01 random embeddings: recall@5 = 0.60/0.80/0.88
    at n_probe 4/8/10 with 16 centroids — random vectors are the hard
    case; clustered real embeddings do far better).
    """
    cents = _train_centroid_list(corpus, id_col, vec_col, n_centroids, seed)

    def nearest_centroids(df: DataFrame, side_id: str, n: int) -> DataFrame:
        return _nearest_cells(df, cents, id_col, vec_col, side_id, n)

    cb = nearest_centroids(_fan_out(corpus), "n_id", 1)  # corpus: home cell only
    qb = nearest_centroids(queries, "q_id", n_probe)     # queries: probe n cells
    # cast+norm once per row on each side of the cell join (the
    # brute_force_topk factoring; bit-identical — see
    # cosine_near_dup_pairs), not per (query, candidate) pair
    cb = cb.select(
        "n_id", "cid", _to_double(F.col("n_id_vec")).alias("n_vec")
    ).withColumn("n_norm", norm(F.col("n_vec")))
    qb = qb.select(
        "q_id", "cid", _to_double(F.col("q_id_vec")).alias("q_vec")
    ).withColumn("q_norm", norm(F.col("q_vec")))
    scored = (
        cb.join(F.broadcast(qb), "cid")
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            F.round(
                dot(F.col("q_vec"), F.col("n_vec"))
                / (F.col("q_norm") * F.col("n_norm")),
                6,
            ).alias("sim"),
        )
        .dropDuplicates(["q_id", "n_id"])
    )
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), "n_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "sim")
    )


def hash_sample(df: DataFrame, id_col: str, fraction: float | None) -> DataFrame:
    """Deterministic hash-sample for quantizer TRAINING — the 100 TB
    recipe: k-means centroids/codebooks converge on a small sample of
    the corpus, so the trainer must not scan (or iterate over) all of
    it. ``xxhash64(id) % 10000`` keeps the sample reproducible across
    runs, partitionings, and appends (``df.sample`` is seeded per
    partition — repartitioning changes the rows it picks)."""
    if fraction is None or fraction >= 1.0:
        return df
    return df.filter(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(10000)) < int(fraction * 10000)
    )


_LOCAL_TRAIN_CAP = 200_000  # rows; ~100 MB at 64 float64 dims


def _kmeans_local(x, k: int, seed: int, max_iter: int = 20, n_init: int = 4):
    """Deterministic Lloyd's k-means over an in-memory sample (numpy,
    k-means++ init from a seeded RNG, matmul distance computation so
    memory is n×k, never n×k×dim), best-of-``n_init`` restarts by
    inertia — restarts are nearly free on a trainer-sized sample and
    close the quality gap to k-means||. This is the trainer-node half
    of the FAISS deploy shape: the *sample selection* is distributed
    (:func:`hash_sample`), the *fit* runs where the sample fits in
    RAM — hundreds of tiny per-iteration Spark jobs (pyspark.ml's
    KMeans on a driver-sized sample) buy nothing at any scale."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    xsq = (x * x).sum(axis=1)

    def d2_to(c):
        # |x|^2 - 2 x.c + |c|^2, clipped at 0 (fp cancellation)
        d = xsq[:, None] - 2.0 * (x @ c.T) + (c * c).sum(axis=1)[None, :]
        return np.maximum(d, 0.0)

    def one_fit(rng):
        centers = x[rng.randint(n)][None, :]
        while len(centers) < k:  # k-means++ seeding
            d2 = d2_to(centers).min(axis=1)
            tot = d2.sum()
            idx = rng.choice(n, p=d2 / tot) if tot > 0 else rng.randint(n)
            centers = np.vstack([centers, x[idx]])
        for _ in range(max_iter):
            assign = d2_to(centers).argmin(axis=1)
            new = np.vstack(
                [
                    x[assign == j].mean(axis=0) if np.any(assign == j) else centers[j]
                    for j in range(k)
                ]
            )
            if np.allclose(new, centers):
                break
            centers = new
        return d2_to(centers).min(axis=1).sum(), centers

    best = min(
        (one_fit(np.random.RandomState(seed + 1000 * r)) for r in range(n_init)),
        key=lambda t: t[0],
    )
    return best[1]


def _collect_train_sample(
    corpus: DataFrame, id_col: str, vec_col: str, train_fraction: float | None
):
    """Hash-sampled vectors collected for a local fit, with a hard cap
    guarding the driver: at 100 TB the sample must be trainer-RAM-
    bounded (FAISS practice: ~1e5-1e6 vectors regardless of corpus
    size). When the requested sample exceeds the cap, it is NOT an
    error (r10 ADVICE: raising made the registered queries a
    scalability regression past SF~10) — the cap is enforced by a
    deterministic distributed top-k on xxhash64(id): a uniform
    exactly-``_LOCAL_TRAIN_CAP``-row subsample, reproducible across
    runs, partitionings and appends (the hash_sample property), at the
    cost of one TakeOrdered instead of a collect-limit. Rows also come
    back in hash order, pinning the k-means++ seed sequence that a
    bare limit() left to scan order."""
    rows = (
        hash_sample(corpus, id_col, train_fraction)
        .select(F.xxhash64(F.col(id_col)).alias("_hk"), _to_double(vec_col).alias("v"))
        .orderBy("_hk", "v")
        .limit(_LOCAL_TRAIN_CAP)
        .collect()
    )
    return [r.v for r in rows]


def _train_centroid_list(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    seed: int,
    train_fraction: float | None = None,
    train_backend: str = "ml",
) -> list[list[float]]:
    """k-means coarse-quantizer centroids as a driver-side list
    (n_centroids × dim floats — driver-sized by construction, like the
    LSH sign matrices), inlined as literals at use sites. Shared by
    :func:`ivf_topk` and :func:`ivf_pq_topk`.
    ``train_fraction`` trains on a deterministic hash-sample (see
    :func:`hash_sample`) — at 100 TB the fit must touch a sample, not
    the corpus; cell ASSIGNMENT always stays full-corpus.
    ``train_backend="local"`` collects the (capped) sample and fits
    with :func:`_kmeans_local` — one Spark job for the sample scan
    instead of ~20 per-iteration jobs; "ml" keeps the pyspark.ml fit
    for samples that exceed one machine."""
    if train_backend == "local":
        sample = _collect_train_sample(corpus, id_col, vec_col, train_fraction)
        centers = _kmeans_local(sample, n_centroids, seed)
        return [[float(v) for v in c] for c in centers]
    try:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(f"IVF requires pyspark.ml: {e}") from e

    train = hash_sample(corpus, id_col, train_fraction).select(
        F.col(id_col), array_to_vector(_to_double(vec_col)).alias("features")
    )
    km = KMeans(k=n_centroids, seed=seed, maxIter=20).fit(train)
    return [[float(x) for x in c] for c in km.clusterCenters()]


def _nearest_cells(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
    side_id: str,
    n: int,
) -> DataFrame:
    """(side_id, {side_id}_vec, cid) rows assigning each vector its
    ``n`` nearest centroids by cosine — the IVF cell key surface.

    Centroids are INLINED AS LITERALS (normalized driver-side, so the
    per-centroid score is one codegen'd dot and ranking by dot equals
    ranking by cosine): assignment is a scan-side projection with ZERO
    shuffle and zero row expansion. The previous formulation — a
    broadcast join against a centroid frame followed by a per-vector
    rank window — expanded the corpus n_centroids× and shuffled the
    expansion, which at 100 TB is a 16× write amplification for what
    is morally an argmax; this shape is why IVF cell assignment stays
    scan-speed at any corpus size. Ties break toward the lowest cid
    (struct max on (score, -cid)), matching the old window order.

    The whole scores array is assembled as ONE SQL string handed to a
    single ``F.expr`` — building n_centroids × dim literal terms
    through the Column API costs thousands of py4j round trips and
    dominated wall time on small corpora (measured ~3 s of pure plan
    construction at 16×64). Each score stays the ``aggregate(zip_with)``
    fold (bit-identical summation order to :func:`dot`): a fold
    codegens as a LOOP, where an unrolled 64-term sum nested 16× in
    one Project blows janino's method limits and drops the whole
    stage to interpreted mode (measured: 14 codegen failures, 2-4×
    slower than the fold form)."""
    terms = []
    for i, c in enumerate(centroids):
        nrm = math.sqrt(sum(x * x for x in c)) or 1.0
        lits = ", ".join(f"{x / nrm!r}D" for x in c)
        d = (
            f"aggregate(zip_with(_qv, array({lits}), (x, y) -> x * y), "
            "0.0D, (acc, x) -> acc + x)"
        )
        terms.append(f"named_struct('s', {d}, 'ncid', {-i})")
    arr = f"array({', '.join(terms)})"
    base = df.withColumn("_qv", _to_double(vec_col))
    cols = [F.col(id_col).alias(side_id), F.col(vec_col).alias(f"{side_id}_vec")]
    if n == 1:
        return base.select(*cols, F.expr(f"-(array_max({arr}).ncid)").alias("cid"))
    top = f"slice(sort_array({arr}, false), 1, {n})"
    return base.select(
        *cols, F.expr(f"explode(transform({top}, t -> -(t.ncid)))").alias("cid")
    )


def pq_train_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    train_fraction: float | None = None,
    train_backend: str = "ml",
) -> list[list[list[float]]]:
    """Train product-quantization codebooks: the vector is cut into
    ``m`` subspaces of ``dim // m`` dims, each with its own ``k``-means
    codebook (pyspark.ml, seeded). Returns ``codebooks[j][c] ->
    centroid`` (m × k × dim/m floats — driver-sized by construction,
    like IVF's centroid list). ``train_fraction`` trains on a
    deterministic hash-sample (:func:`hash_sample`) — the 100 TB
    recipe; encoding stays full-scan either way. The sampled frame is
    cached across the ``m`` fits so the sample filter scans once, not
    m times. ``train_backend="local"`` collects the capped sample ONCE
    and fits all ``m`` subspace codebooks in numpy
    (:func:`_kmeans_local`) — one Spark job total instead of
    m × maxIter."""
    if train_backend == "local":
        import numpy as np

        sample = np.asarray(
            _collect_train_sample(corpus, id_col, vec_col, train_fraction)
        )
        sub = dim // m
        return [
            [
                [float(v) for v in c]
                for c in _kmeans_local(sample[:, j * sub : (j + 1) * sub], k, seed + j)
            ]
            for j in range(m)
        ]
    try:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(f"PQ requires pyspark.ml: {e}") from e

    sub = dim // m
    v = _to_double(vec_col)
    base = hash_sample(corpus, id_col, train_fraction)
    cached = base if train_fraction is None else base.cache()
    try:
        books: list[list[list[float]]] = []
        for j in range(m):
            train = cached.select(
                array_to_vector(F.slice(v, j * sub + 1, sub)).alias("features")
            )
            km = KMeans(k=k, seed=seed + j, maxIter=20).fit(train)
            books.append([[float(x) for x in c] for c in km.clusterCenters()])
    finally:
        if cached is not base:
            cached.unpersist()
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector its ``m`` nearest-centroid codes (array<int>)
    with an Arrow-batched numpy Pandas UDF — PQ encoding is exactly the
    "fat per-row math" case where the Python boundary pays for itself:
    the equivalent column expression is m*k HOF aggregates + argmin
    when-chains (measured: multi-MiB task binaries and compile-bound
    runs), while numpy does one (batch, k, sub) broadcast subtract per
    subspace. Codes are m small ints per vector — the compression that
    makes 100 TB corpora rankable in memory."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    m = len(codebooks)
    sub = len(codebooks[0][0])
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]

    def enc(s):
        x = np.asarray(s.to_list(), dtype=np.float64)  # (batch, dim)
        out = np.empty((x.shape[0], m), dtype=np.int32)
        for j in range(m):
            xj = x[:, j * sub:(j + 1) * sub]  # (batch, sub)
            d = ((xj[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)
            out[:, j] = d.argmin(axis=1)
        return pd.Series(list(out))

    enc_udf = F.pandas_udf(enc, returnType=T.ArrayType(T.IntegerType()))
    return df.select(F.col(id_col), enc_udf(_to_double(vec_col)).alias("codes"))


def _pq_query_lut(
    codebooks: list[list[list[float]]], qv_col: str, dim: int
) -> Column:
    """Per-query ADC lookup table: subspace dot products of the query
    against every centroid (m × k doubles). Travels with the broadcast
    query row, so pre-ranking a corpus vector is ``m`` lookups+adds.
    ``qv_col`` names a prepared array<double> column; the m × k × sub
    literal terms are assembled as one SQL string (single py4j call —
    the Column-API version cost ~2 s of plan construction per query
    build), each subspace dot the same ``aggregate(zip_with)`` fold as
    before (codegens as a loop; see :func:`_nearest_cells` on why
    unrolled sums are worse)."""
    m = len(codebooks)
    n_codes = len(codebooks[0])
    sub = dim // m
    outer = []
    for j in range(m):
        cells = ", ".join(
            f"aggregate(zip_with(slice({qv_col}, {j * sub + 1}, {sub}), "
            "array(" + ", ".join(f"{x!r}D" for x in codebooks[j][c]) + "), "
            "(x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
            for c in range(n_codes)
        )
        outer.append(f"array({cells})")
    return F.expr(f"array({', '.join(outer)})")


def _pq_adc(m: int) -> Column:
    """Asymmetric-distance score from a joined (lut, codes) pair."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.get(F.get(F.col("lut"), j), F.get(F.col("codes"), j)),
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    seed: int = 42,
    rerank: int | None = None,
    train_fraction: float | None = None,
    train_backend: str = "ml",
) -> DataFrame:
    """PQ ANN top-k, two-stage as deployed in practice: (1) asymmetric
    distance computation — each query precomputes a lookup table of
    subspace dot products against every centroid (m × n_codes doubles,
    broadcast with the query), so pre-ranking a corpus vector is ``m``
    table lookups + adds, touching only its codes; (2) the ADC top-
    ``rerank`` candidates are re-scored with the EXACT float dot
    product and the true top-k emitted. Code-only ranking on random
    (worst-case) vectors has low fidelity at the @5 grain, but the
    @``rerank`` grain is robust — the two-stage shape converts that
    into high recall@k while still scanning codes, not floats.
    Output: q_id, n_id, rank, sim (exact dot, round 6).

    ``train_fraction`` / ``train_backend`` are threaded to
    :func:`pq_train_codebooks` — same semantics as :func:`ivf_pq_topk`
    (hash-sampled training; ``"local"`` = one capped collect + numpy
    Lloyd's instead of m × maxIter tiny pyspark.ml jobs); ADC scan and
    exact re-rank stay full-corpus and distributed either way.

    ``rerank`` defaults to max(50, corpus/10): a FIXED rerank budget
    decays as the corpus grows (ADC noise admits more impostors into
    any constant-size shortlist — measured recall@5 0.72 at 500
    vectors but 0.54 at 2000 with rerank=50; 0.76 at 2000 with the
    adaptive 10%). At deployment scale set it explicitly from the
    recall SLO — with IVF composition the fraction applies to the
    probed cells, not the whole corpus."""
    if rerank is None:
        rerank = max(50, -(-corpus.count() // 10))
    books = pq_train_codebooks(
        corpus, vec_col, m, n_codes, dim, seed, id_col, train_fraction, train_backend
    )
    corpus_cached = _fan_out(corpus)
    cb = pq_encode(corpus_cached, books, id_col, vec_col).select(
        F.col(id_col).alias("n_id"), "codes"
    )
    qb = queries.withColumn("_qv", _to_double(vec_col)).select(
        F.col(id_col).alias("q_id"), F.col("_qv").alias("q_vec"),
        _pq_query_lut(books, "_qv", dim).alias("lut"),
    )
    adc = _pq_adc(m)
    pre = cb.join(F.broadcast(qb.select("q_id", "lut")), F.col("q_id") != F.col("n_id")).select(
        "q_id", "n_id", adc.alias("adc")
    )
    wpre = W.partitionBy("q_id").orderBy(F.desc("adc"), "n_id")
    cand = pre.withColumn("crank", F.row_number().over(wpre)).filter(
        F.col("crank") <= rerank
    )
    nv = corpus_cached.select(
        F.col(id_col).alias("n_id"), _to_double(vec_col).alias("n_vec")
    )
    exact = (
        cand.join(nv, "n_id")
        .join(qb.select("q_id", "q_vec"), "q_id")
        .select("q_id", "n_id", F.round(dot(F.col("q_vec"), F.col("n_vec")), 6).alias("sim"))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), "n_id")
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "sim")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 10,
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    seed: int = 42,
    rerank: int | None = None,
    train_fraction: float | None = None,
    train_backend: str = "ml",
) -> DataFrame:
    """IVF×PQ composed ANN — the 100 TB deploy shape (FAISS IVFPQ on a
    cluster): the coarse quantizer prunes the corpus to the queries'
    probed cells BEFORE any scoring, then only those candidates are
    ADC-scored from their int codes, and only the ADC top-``rerank``
    touch float vectors again for the exact re-rank.

    Per-query work is therefore (corpus/n_centroids)×n_probe code
    lookups + ``rerank`` float dots — sublinear candidate generation
    (cell equi-join; no corpus-wide pair scan as in plain
    :func:`pq_topk`) feeding a compressed scan (codes are 4-8× smaller
    than float32 — the representation that fits a 1000-executor
    memory budget). Ranking quality is asserted as a recall property
    against exact search (k-means is engine-specific, so bit-exact
    oracles don't apply — same stance as IVF and PQ alone).
    Output: q_id, n_id, rank (1..k), sim (exact dot, round 6).
    ``rerank`` defaults to max(50, corpus/10) — see :func:`pq_topk`.
    ``train_fraction`` fits the coarse quantizer AND the codebooks on
    a deterministic hash-sample (:func:`hash_sample`) — the deploy
    configuration: at 100 TB the k-means iterations must scan a
    sample, while cell assignment and encoding stay full-corpus."""
    if rerank is None:
        rerank = max(50, -(-corpus.count() // 10))
    cents = _train_centroid_list(
        corpus, id_col, vec_col, n_centroids, seed, train_fraction, train_backend
    )
    books = pq_train_codebooks(
        corpus, vec_col, m, n_codes, dim, seed, id_col, train_fraction, train_backend
    )
    corpus_f = _fan_out(corpus)
    # corpus side: home cell + PQ codes, joined once on id
    cells = _nearest_cells(corpus_f, cents, id_col, vec_col, "n_id", 1).select(
        "n_id", "cid"
    )
    codes = pq_encode(corpus_f, books, id_col, vec_col).select(
        F.col(id_col).alias("n_id"), "codes"
    )
    cb = cells.join(codes, "n_id")
    # query side: n_probe cells + the per-query ADC LUT (broadcast)
    q_cells = _nearest_cells(queries, cents, id_col, vec_col, "q_id", n_probe).select(
        "q_id", "cid"
    )
    q_lut = queries.withColumn("_qv", _to_double(vec_col)).select(
        F.col(id_col).alias("q_id"), F.col("_qv").alias("q_vec"),
        _pq_query_lut(books, "_qv", dim).alias("lut"),
    )
    # candidate generation: cell equi-join (corpus rows have exactly one
    # home cell, so (q_id, n_id) pairs are already distinct)
    pre = (
        cb.join(F.broadcast(q_cells), "cid")
        .filter(F.col("q_id") != F.col("n_id"))
        .join(F.broadcast(q_lut.select("q_id", "lut")), "q_id")
        .select("q_id", "n_id", _pq_adc(m).alias("adc"))
    )
    wpre = W.partitionBy("q_id").orderBy(F.desc("adc"), "n_id")
    cand = pre.withColumn("crank", F.row_number().over(wpre)).filter(
        F.col("crank") <= rerank
    )
    nv = corpus_f.select(F.col(id_col).alias("n_id"), _to_double(vec_col).alias("n_vec"))
    exact = (
        cand.join(nv, "n_id")
        .join(q_lut.select("q_id", "q_vec"), "q_id")
        .select("q_id", "n_id", F.round(dot(F.col("q_vec"), F.col("n_vec")), 6).alias("sim"))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), "n_id")
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "sim")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: id_a < id_b with
    round(cosine, 6) >= threshold.

    The demo/validation shape self-joins all pairs — the join side is
    corpus-scaled, so it carries NO pinned broadcast hint (the
    optimizer still broadcasts while the frame is validation-sized; a
    pinned hint would defeat its size-based fallback). At 100 TB the
    candidate generation must go through
    :func:`hyperplane_lsh_buckets` first (bucket equi-join), with this
    exact scoring applied only inside buckets.
    """
    # double-cast and norm factored to ONCE per row on each side (the
    # brute_force_topk lesson, r12): inside cosine() they re-evaluated
    # per PAIR — 2 array casts + 2 norm folds x O(N) per row on an
    # all-pairs join. Arithmetic is bit-identical: same sequential fold
    # order over the same doubles, and IEEE multiply/divide are exact
    # given the same operands, so the round-6 sims are unchanged.
    a = (
        _fan_out(df)
        .select(F.col(id_col).alias("id_a"), _to_double(F.col(vec_col)).alias("va"))
        .withColumn("na", norm(F.col("va")))
    )
    b = df.select(
        F.col(id_col).alias("id_b"), _to_double(F.col(vec_col)).alias("vb")
    ).withColumn("nb", norm(F.col("vb")))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def hyperplane_signs(dim: int, planes: int, seed: int = 42) -> list[list[int]]:
    """Deterministic ±1 hyperplane components, derived from md5 in
    plain Python (ops.hashing) so the exact same constants can be
    inlined into BOTH the Spark plan and a DuckDB oracle — no
    per-row hashing in either engine."""
    from .hashing import py_md5_long

    return [
        [py_md5_long(f"{i}:{p}:{seed}") % 2 * 2 - 1 for i in range(dim)]
        for p in range(planes)
    ]


def _qv_sql(vec_col: str) -> str:
    """SQL text of :func:`_quantize` over a named column — embedded
    verbatim in every plane term so whole-stage codegen's
    subexpression elimination computes it ONCE per row (identical
    subtrees dedupe; a HOF lambda capturing it would re-evaluate it
    per plane — measured 21 vs 12 s on the 200k-vector prune join)."""
    return (
        f"transform(transform({vec_col}, x -> CAST(x AS DOUBLE)), "
        "x -> round(x * 1000000))"
    )


def _bucket_sql(vec_col: str, signs: list[list[int]]) -> str:
    """The UNROLLED bucket id as one SQL string: per plane, a
    zip_with+aggregate dot fold against the sign literal (same fold
    order as :func:`dot`, so bucket ids are bit-identical to the
    Column-built form and to the DuckDB oracles), CASE'd to its 2^p
    bit weight and summed.

    Why a generated SQL string (the _pq_query_lut lesson, round 2 of
    learning it): building this with the Column API costs one py4j
    round trip PER element — 64 planes x 64 dims was ~7 s of pure
    driver time per query build — while one F.expr is one round trip
    and a millisecond JVM parse. And why UNROLLED rather than a
    transform() over a sign-matrix literal: unrolled terms live in one
    projection where codegen CSE hoists the shared quantize subtree,
    but a lambda re-evaluates captured subtrees per element — the HOF
    form was 1.75x slower on the 200k-vector prune join."""
    qv = _qv_sql(vec_col)
    terms = []
    for p, srow in enumerate(signs):
        arr = "array(" + ",".join(f"{float(s)}D" for s in srow) + ")"
        proj = (
            f"aggregate(zip_with({qv}, {arr}, (x, y) -> x * y), "
            "0.0D, (acc, x) -> acc + x)"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << p}L ELSE 0L END)")
    return "(" + " + ".join(terms) + ")"


def _quantize(vec_col: Column | str) -> Column:
    """Embedding scaled to integer-valued doubles (round(x * 1e6)).
    Signed sums of integer-valued doubles are EXACT in IEEE arithmetic
    (values ≪ 2^53), so hyperplane projections are bit-identical
    regardless of summation order — the property that makes LSH bucket
    ids reproducible across engines."""
    return F.transform(_to_double(vec_col), lambda x: F.round(x * 1_000_000))


def hyperplane_lsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 16,
    seed: int = 42,
    dim: int = 64,
    first_plane: int = 0,
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector.

    Sign matrix is precomputed driver-side (:func:`hyperplane_signs`)
    and inlined as literals: one codegen'd projection per vector, no
    shuffle, no per-row hashing. Projections run on the quantized
    embedding (:func:`_quantize`) so bucket ids match the DuckDB
    oracle bit-for-bit. ``first_plane`` offsets into the global plane
    family so multi-table LSH can slice disjoint plane sets.
    """
    signs = hyperplane_signs(dim, first_plane + planes, seed)[first_plane:]
    bucket = F.expr(_bucket_sql(vec_col, signs))
    return df.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def multi_table_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tables: int = 16,
    planes_per_table: int = 4,
    seed: int = 42,
    dim: int = 64,
    keep_vec: bool = False,
) -> DataFrame:
    """One (id, t, bucket) row per (vector, LSH table), each table's
    bucket built from its disjoint slice of the global hyperplane
    family — the shared candidate-key surface of the multi-table
    near-dup join and the persisted index. ``keep_vec`` carries the
    embedding through (denormalized, the standard LSH index trade) so
    index lookups never join back to the corpus."""
    signs = hyperplane_signs(dim, tables * planes_per_table, seed)
    # one (t, bucket) struct per table, each bucket the unrolled SQL
    # form over its disjoint plane slice (see _bucket_sql on why ONE
    # generated SQL string beats both a lit() loop and a HOF)
    p = planes_per_table
    tb = F.expr(
        "array("
        + ",".join(
            f"named_struct('t', {t}, "
            f"'bucket', {_bucket_sql(vec_col, signs[t * p:(t + 1) * p])})"
            for t in range(tables)
        )
        + ")"
    )
    cols = [F.col(id_col).alias("id"), F.explode(tb).alias("tb")]
    out = df.select(*cols, *([F.col(vec_col).alias("vec")] if keep_vec else []))
    keep = ["id", "tb.t", "tb.bucket"] + (["vec"] if keep_vec else [])
    return out.select(*keep)


def write_lsh_index(
    df: DataFrame,
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tables: int = 4,
    planes_per_table: int = 4,
    seed: int = 42,
    dim: int = 64,
    n_buckets: int = 32,
) -> None:
    """Persist a multi-table LSH index as a BUCKETED table keyed on the
    composite (table, bucket) id: the corpus-x-corpus candidate
    self-join — the operation that dominates near-dup cost at 100 TB —
    then runs with ZERO shuffle (both join inputs stream from co-located
    buckets of one scan; proven in tests/test_bucketing.py). ``tb``
    packs (t, bucket) into one bigint so the storage bucketing key and
    the join key coincide. Appending a daily batch re-uses the same
    hyperplane family (deterministic from ``seed``), so the index is
    append-only like the corpus."""
    from ..io_sinks import write_bucketed

    rows = _lsh_index_rows(df, id_col, vec_col, tables, planes_per_table, seed, dim)
    write_bucketed(rows, table, "tb", n_buckets=n_buckets, sort_col="tb")


def _lsh_index_rows(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tables: int = 4,
    planes_per_table: int = 4,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """(id, tb, vec) index rows — shared by the initial bulk build and
    incremental appends (same hyperplane family, same composite key)."""
    return multi_table_buckets(
        df, id_col, vec_col, tables, planes_per_table, seed, dim, keep_vec=True
    ).select(
        "id",
        (F.col("t") * (1 << planes_per_table) + F.col("bucket")).alias("tb"),
        "vec",
    )


def append_lsh_index(
    df: DataFrame,
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tables: int = 4,
    planes_per_table: int = 4,
    seed: int = 42,
    dim: int = 64,
    n_buckets: int = 32,
) -> None:
    """Append a batch of vectors to an existing LSH index table. The
    hyperplane family is a pure function of ``seed``, so appended rows
    land in exactly the buckets the bulk build would have put them in —
    the index stays append-only like the corpus, and the candidate
    self-join stays shuffle-free (Spark validates the bucket spec on
    append). This is the daily-ingest half of the 100 TB story; the
    streaming wrapper (streaming.landing.stream_append_lsh_index)
    drives it per micro-batch."""
    rows = _lsh_index_rows(df, id_col, vec_col, tables, planes_per_table, seed, dim)
    rows.write.mode("append").bucketBy(n_buckets, "tb").sortBy("tb").saveAsTable(table)


def lsh_near_dup_pairs_indexed(spark, table: str, threshold: float = 0.35) -> DataFrame:
    """Near-dup pairs straight off a persisted LSH index
    (:func:`write_lsh_index`): self-equi-join on the composite bucket
    key — shuffle-free thanks to storage bucketing — exact cosine from
    the denormalized vectors (no join back to the corpus), then pair
    dedup. The pair-dedup shuffle is on the emitted candidate pairs,
    proportional to near-dup density, not corpus size.

    The table is refreshed first: an index kept fresh by ANOTHER
    writer (a streaming foreachBatch append runs in a cloned
    micro-batch session; a daily job is another session entirely)
    leaves this session's cached file listing stale, and reads would
    silently miss the appended files."""
    spark.catalog.refreshTable(table)
    # cast+norm once per index row before the self-join (the
    # brute_force_topk factoring; bit-identical — see
    # cosine_near_dup_pairs): an index row meets every bucket-mate, so
    # hoisting divides the cast + norm-fold work by bucket occupancy.
    b = spark.table(table).withColumn("vd", _to_double(F.col("vec"))).withColumn(
        "nrm", norm(F.col("vd"))
    )
    a, c = b.alias("a"), b.alias("b")
    scored = (
        a.join(c, (F.col("a.tb") == F.col("b.tb")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                dot(F.col("a.vd"), F.col("b.vd"))
                / (F.col("a.nrm") * F.col("b.nrm")),
                6,
            ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
    return scored.dropDuplicates(["id_a", "id_b"])


def lsh_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tables: int = 16,
    planes_per_table: int = 4,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via multi-table hyperplane LSH:
    candidates from ``tables`` independent bucket equi-joins (disjoint
    plane slices of one global family), deduped, then exact-cosine
    scored and filtered — NO all-pairs join anywhere.

    Scale: the only joins are equi-joins on (table, bucket); the corpus
    is replicated ``tables`` times through the explode (standard LSH
    space/recall trade). At 100 TB raise ``planes_per_table`` so bucket
    count (2^planes) scales with corpus size — candidates per bucket,
    not tables, dominate cost. Recall for pairs at cosine s is
    1-(1-c^r)^T with c = 1-acos(s)/pi; 16x4 gives ~0.92 at s=0.35 and
    ~1.0 for genuinely-near pairs.
    """
    banded = multi_table_buckets(
        _fan_out(df), id_col, vec_col, tables, planes_per_table, seed, dim
    ).select("id", "t", "bucket")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.t") == F.col("b.t")) & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # cast+norm once per vector row, not per candidate pair (the
    # brute_force_topk factoring; bit-identical — see
    # cosine_near_dup_pairs): a vector joins into MANY candidate pairs,
    # so hoisting its cast and norm fold above the join divides that
    # work by its pair multiplicity.
    ea = df.select(
        F.col(id_col).alias("id_a"), _to_double(F.col(vec_col)).alias("va")
    ).withColumn("na", norm(F.col("va")))
    eb = df.select(
        F.col(id_col).alias("id_b"), _to_double(F.col(vec_col)).alias("vb")
    ).withColumn("nb", norm(F.col("vb")))
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def sq8_codes(
    df: DataFrame,
    stats: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Scalar-quantize embeddings to centered int8-range codes
    (FAISS-SQ8 style): per-dimension min/max linear map to 0..255, then
    center by 128. ``stats`` is the 1-row (mn, mx) array frame from
    :func:`sq8_stats`. Quantization is a pure deterministic projection
    (floor of identical IEEE doubles), so another engine replays codes
    bit-for-bit — unlike k-means codebooks (IVF/PQ), SQ needs no
    training and its oracle can be exact."""
    v = _to_double(vec_col)
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    mn, mx = F.col("mn"), F.col("mx")
    code = F.transform(
        idx,
        lambda i: F.when(F.get(mx, i) == F.get(mn, i), F.lit(0).cast("long")).otherwise(
            F.floor(((F.get(v, i) - F.get(mn, i)) * 255.0) / (F.get(mx, i) - F.get(mn, i)))
        )
        - 128,
    )
    return df.crossJoin(F.broadcast(stats)).select(
        F.col(id_col), code.alias("codes")
    )


def sq8_stats(df: DataFrame, vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """Per-dimension min/max of the corpus as ONE row of two arrays —
    a single hash-aggregate pass (2*dim partial min/max states, all
    map-side combinable; no explode, no shuffle of row data)."""
    v = _to_double(vec_col)
    return df.agg(
        F.array(*[F.min(F.get(v, i)) for i in range(dim)]).alias("mn"),
        F.array(*[F.max(F.get(v, i)) for i in range(dim)]).alias("mx"),
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Exact-over-quantized top-k: rank by the integer dot product of
    centered SQ8 codes (queries quantized with the corpus stats —
    symmetric SQ). Output: q_id, n_id, rank, score (BIGINT).

    Scale story: codes are 4x smaller than float32 and the scoring loop
    is a pure integer multiply-add — this is the representation you
    ship to a 100 TB corpus scan; compose with IVF/LSH candidate
    generation to also cut the pair count. Integer products (<= 2^22
    per term) sum exactly in any order and any engine, so unlike float
    scoring the ranking is bit-reproducible end-to-end."""
    stats = sq8_stats(corpus, vec_col, dim)
    cb = sq8_codes(_fan_out(corpus), stats, id_col, vec_col, dim).select(
        F.col(id_col).alias("n_id"), F.col("codes").alias("n_codes")
    )
    qb = sq8_codes(queries, stats, id_col, vec_col, dim).select(
        F.col(id_col).alias("q_id"), F.col("codes").alias("q_codes")
    )
    score = F.aggregate(
        F.zip_with(F.col("q_codes"), F.col("n_codes"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = cb.join(F.broadcast(qb), F.col("q_id") != F.col("n_id")).select(
        "q_id", "n_id", score.alias("score")
    )
    w = W.partitionBy("q_id").orderBy(F.desc("score"), "n_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "score")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
) -> DataFrame:
    """ANN top-k: hyperplane-LSH bucket equi-join, then exact re-rank
    inside the bucket. Recall < 1.0 by construction; bucket join replaces
    the cross join, which is the move that survives 100 TB."""
    # cast+norm once per row on each side of the bucket join (the
    # brute_force_topk factoring; bit-identical — see
    # cosine_near_dup_pairs), not per (query, candidate) pair.
    cb = (
        hyperplane_lsh_buckets(_fan_out(corpus), id_col, vec_col, planes)
        .select(
            F.col(id_col).alias("n_id"),
            _to_double(F.col(vec_col)).alias("n_vec"),
            "bucket",
        )
        .withColumn("n_norm", norm(F.col("n_vec")))
    )
    qb = (
        hyperplane_lsh_buckets(queries, id_col, vec_col, planes)
        .select(
            F.col(id_col).alias("q_id"),
            _to_double(F.col(vec_col)).alias("q_vec"),
            "bucket",
        )
        .withColumn("q_norm", norm(F.col("q_vec")))
    )
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            F.round(
                dot(F.col("q_vec"), F.col("n_vec"))
                / (F.col("q_norm") * F.col("n_norm")),
                6,
            ).alias("sim"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), "n_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "sim")
    )


def semantic_prune(
    df: DataFrame,
    planes: int = 4,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """SemDeDup-style survivor pruning: deterministic hyperplane-LSH
    buckets stand in for the paper's k-means clusters, and within each
    bucket a vector is pruned iff a lower-id bucket-mate sits within
    the cosine threshold (lowest id survives each near-dup set).

    Output: (id, bucket, pruned). The only join is the within-bucket
    self-equi-join — cost bounded by bucket occupancy; raise ``planes``
    with corpus size (2^planes ~ k ~ sqrt(n), the SemDeDup heuristic)
    exactly like the LSH dedup family. Registered as
    ``dedup_semantic_prune`` (workload/curation.py) with a bit-exact
    DuckDB replay of clustering + verdicts.
    """
    b = hyperplane_lsh_buckets(_fan_out(df), id_col, vec_col, planes, seed, dim)
    # cast+norm once per vector row before the bucket self-join (the
    # brute_force_topk factoring; bit-identical — see
    # cosine_near_dup_pairs): a vector meets every bucket-mate, so
    # hoisting divides the cast + norm-fold work by bucket occupancy.
    bf = b.select(
        id_col, "bucket", _to_double(F.col(vec_col)).alias("vd")
    ).withColumn("nrm", norm(F.col("vd")))
    a, c = bf.alias("a"), bf.alias("c")
    pruned = (
        a.join(
            c,
            (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col(f"c.{id_col}") < F.col(f"a.{id_col}")),
        )
        .filter(
            F.round(
                dot(F.col("a.vd"), F.col("c.vd"))
                / (F.col("a.nrm") * F.col("c.nrm")),
                6,
            )
            >= threshold
        )
        .select(F.col(f"a.{id_col}").alias(id_col))
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    return (
        b.select(id_col, "bucket")
        .join(pruned, id_col, "left")
        .select(id_col, "bucket", F.coalesce("hit", F.lit(False)).alias("pruned"))
    )


def knn_graph(
    df: DataFrame,
    k: int = 3,
    planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Approximate all-corpus k-NN graph: every vector's top-k
    neighbors among its hyperplane-bucket mates, exact-cosine ranked
    with a unique tiebreak — the edge list SemDeDup clustering, label
    propagation and graph-based curation consume.

    Output: (src_id, n_id, rank, sim). One bucket self-equi-join plus
    a per-source top-k window; no all-pairs join. Raise ``planes``
    with corpus size to hold bucket occupancy (and per-source
    candidate count) constant. Registered as ``sim_knn_graph``
    (workload/curation.py) with a bit-exact oracle.
    """
    b = hyperplane_lsh_buckets(_fan_out(df), id_col, vec_col, planes, seed, dim)
    # cast+norm once per vector row before the bucket self-join — the
    # same bit-identical factoring as semantic_prune above.
    bf = b.select(
        id_col, "bucket", _to_double(F.col(vec_col)).alias("vd")
    ).withColumn("nrm", norm(F.col("vd")))
    a, c = bf.alias("a"), bf.alias("c")
    scored = a.join(
        c,
        (F.col("a.bucket") == F.col("c.bucket"))
        & (F.col(f"a.{id_col}") != F.col(f"c.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("src_id"),
        F.col(f"c.{id_col}").alias("n_id"),
        F.round(
            dot(F.col("a.vd"), F.col("c.vd")) / (F.col("a.nrm") * F.col("c.nrm")),
            6,
        ).alias("sim"),
    )
    w = W.partitionBy("src_id").orderBy(F.desc("sim"), "n_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("src_id", "n_id", "rank", "sim")
    )
