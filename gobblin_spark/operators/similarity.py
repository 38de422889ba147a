"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``     brute-force top-k: broadcast the (small) query set,
                      JVM-side dot/norm via zip_with + aggregate — the exact
                      baseline. Scales as |queries| × |corpus| with the corpus
                      scanned once, partition-parallel, no shuffle of the
                      corpus side (broadcast hash join).
- ``ivf_topk``        IVF-style scale path: k-means-free deterministic
                      coarse quantizer (first C corpus vectors as centroids),
                      vectors assigned to nearest centroid once; queries probe
                      only the nearest ``nprobe`` cells. Search cost drops to
                      |queries| × |corpus| · nprobe/C under even cells.
- ``lsh_bucket_topk`` random-hyperplane LSH variant: sign-bit signature via
                      deterministic pseudo-hyperplanes (hash-derived), probe
                      same-bucket candidates only.

Dot products stay in whole-stage codegen (higher-order functions on the
array column) — no Python, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    # cast each element to double BEFORE multiplying: float32 values embed
    # exactly in float64, so the sequential double accumulation is bit-stable
    # and reproducible across engines
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Top-k cosine neighbors of each query among the corpus (self excluded).

    Returns (query_id, neighbor_id, rank). Similarity is rounded before
    ranking (ties then broken by neighbor id) so rankings are reproducible
    across engines and float summation orders."""
    # per-vector norms computed once (identical expression tree to the
    # inline form ⇒ bit-identical results; 3× less aggregate work per pair)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    sim = F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), round_digits)
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def assign_cells(
    emb: DataFrame, n_cells: int = 16, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic coarse quantizer: centroids = the n_cells lowest-id
    vectors; every vector assigned to its max-cosine centroid."""
    cents = emb.orderBy(id_col).limit(n_cells).select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("centroid")
    )
    sim = _dot(F.col(vec_col), F.col("centroid")) / (
        _norm(F.col(vec_col)) * _norm(F.col("centroid"))
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        F.col(id_col), F.col(vec_col), F.col("cell"), sim.alias("csim")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, "cell")
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    min_sim_x10k: int = 9000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: all (a < b) with
    round(cosine, 4)·10⁴ ≥ threshold. Quadratic by definition (the exact
    baseline); ``lsh_neardup_pairs`` is the scale path."""
    # norms precomputed once per vector: sqrt(dot(v,v)) here is the exact
    # expression the per-pair formula used, so results stay bit-identical
    # while the pair loop does one aggregate instead of three
    a = emb.select(
        F.col(id_col).alias("a_id"), F.col(vec_col).alias("av"), _norm(F.col(vec_col)).alias("an")
    )
    b = emb.select(
        F.col(id_col).alias("b_id"), F.col(vec_col).alias("bv"), _norm(F.col(vec_col)).alias("bn")
    )
    sim = F.round(_dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")), 4)
    # keep sim as a rounded double (identical IEEE ops in any engine computing
    # the same ordered sum ⇒ bit-identical filter decisions)
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", sim.alias("sim"))
        .filter(F.col("sim") >= F.lit(min_sim_x10k) / F.lit(10000.0))
    )


def _hyperplane_signs(vec_col, dim: int, nbits: int, seed: int = 42):
    """sign-bit signature via deterministic pseudo-random hyperplanes: bit j =
    [Σ_i v_i · r_ji > 0] with r_ji ∈ {-1, +1} derived from a seeded hash.
    Returns (bucket long expr). All JVM-side literals + zip_with/aggregate."""
    import random

    rnd = random.Random(seed)
    sig = F.lit(0).cast("long")
    for j in range(nbits):
        coeffs = F.array(*[F.lit(1.0 if rnd.random() < 0.5 else -1.0) for _ in range(dim)])
        proj = F.aggregate(
            F.zip_with(vec_col, coeffs, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def lsh_bucket_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH top-k: corpus and queries bucketed by an
    nbits sign signature; each query scores only same-bucket candidates.
    Search cost ≈ |corpus| / 2^nbits per query under even buckets; recall < 1
    (baseline: cosine_topk)."""
    from pyspark.sql import Window

    dim = len(emb.select(vec_col).first()[0])
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
        _hyperplane_signs(F.col(vec_col), dim, nbits, seed).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
        _hyperplane_signs(F.col(vec_col), dim, nbits, seed).alias("bucket"),
    )
    cand = F.broadcast(q).join(c, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    sim = F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 4)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cand.select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe only the ``nprobe`` nearest cells per
    query. Recall < 1 by design; the exact baseline is cosine_topk."""
    cells = assign_cells(emb, n_cells, id_col, vec_col)
    cents = emb.orderBy(id_col).limit(n_cells).select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("centroid")
    )
    qsim = _dot(F.col("qv"), F.col("centroid")) / (_norm(F.col("qv")) * _norm(F.col("centroid")))
    from pyspark.sql import Window

    wq = Window.partitionBy("query_id").orderBy(F.desc("qsim"), F.asc("cell"))
    probes = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .crossJoin(F.broadcast(cents))
        .select("query_id", "qv", "cell", qsim.alias("qsim"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "cell")
    )
    cand = probes.join(
        cells.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            _norm(F.col(vec_col)).alias("cn"),
            "cell",
        ),
        "cell",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    sim = F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * F.col("cn")), 4)
    wr = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cand.select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
