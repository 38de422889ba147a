"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``        brute-force top-k: broadcast the (small) query set,
                         JVM-side dot/norm via zip_with + aggregate — the
                         exact baseline. Corpus scanned once, no shuffle.
- ``embedding_neardup_pairs``  EXACT all-pairs near-dup — blocked: chunk the
                         corpus, cross-join chunk pairs, score each block pair
                         with one vectorized numpy matmul (Arrow batches, no
                         per-row Python), then confirm candidates with the
                         bit-stable JVM expression. Same results as the naive
                         quadratic join, ~100× the arithmetic throughput, and
                         memory bounded by two chunks per task.
- ``lsh_neardup_pairs``  the SCALE path: multi-table random-hyperplane LSH
                         prefilter + exact verify. Work scales with bucket
                         sizes, not n². Recall = 1-(1-p^r)^T with
                         p = 1 - θ/π per hyperplane.
- ``ivf_topk``           IVF-style scale path: Lloyd-trained deterministic
                         coarse quantizer (``train_centroids`` — exact
                         integer arithmetic, engine-reproducible), queries
                         probe the nearest ``nprobe`` cells only.
- ``lsh_bucket_topk``    single-table hyperplane LSH top-k.

Determinism across engines: hyperplane signs are computed over INTEGER-
quantized components (floor(v·2²⁰), exact in IEEE double since ×2²⁰ is a
power-of-two scale), so bucket assignments are bit-identical in any engine —
the DuckDB contract oracles replicate the LSH pipelines value-for-value.
Similarities are rounded to 4 digits before ranking/thresholding (ties broken
by id) for the same reason.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_QSCALE = 1 << 20  # power-of-two quantizer: v*2^20 is EXACT in double


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


def hyperplanes(dim: int, nbits: int, seed: int = 42) -> list[list[int]]:
    """Deterministic ±1 hyperplane coefficients (seeded)."""
    rnd = random.Random(seed)
    return [[1 if rnd.random() < 0.5 else -1 for _ in range(dim)] for _ in range(nbits)]


def _lsh_signatures(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[int]],
    nbits: int,
    out_id: str = "id",
) -> DataFrame:
    """(id, tbl, bkt) signature rows: hyperplane sign bits over INTEGER-
    quantized components (floor(v·2²⁰), exact in double; ×±1 and summed in
    int64 — associative, so ANY evaluation order gives the same bits). The
    projection is one vectorized numpy int64 matmul per Arrow batch — no
    per-row Python, and bit-identical to the DuckDB replication oracle.
    ``planes`` is grouped into tables of ``nbits`` consecutive planes."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    n_tables = len(planes) // nbits
    pm = [list(p) for p in planes]

    def gen(batches):
        P = np.array(pm, dtype=np.int64)  # (n_tables*nbits, dim)
        weights = (1 << np.arange(nbits, dtype=np.int64))
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            Q = np.floor(V * float(_QSCALE)).astype(np.int64)
            bits = (Q @ P.T > 0).astype(np.int64)  # (n, n_tables*nbits)
            bkt = bits.reshape(len(ids), n_tables, nbits) @ weights  # (n, n_tables)
            yield pd.DataFrame(
                {
                    out_id: np.repeat(ids, n_tables),
                    "tbl": np.tile(np.arange(n_tables, dtype=np.int32), len(ids)),
                    "bkt": bkt.reshape(-1),
                }
            )

    schema = T.StructType(
        [
            T.StructField(out_id, T.LongType()),
            T.StructField("tbl", T.IntegerType()),
            T.StructField("bkt", T.LongType()),
        ]
    )
    return df.select(id_col, vec_col).mapInPandas(gen, schema)


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


def _verify_pairs(
    cand: DataFrame, emb: DataFrame, id_col: str, vec_col: str, min_sim_x10k: int
) -> DataFrame:
    """Exact confirmation of candidate (a_id, b_id) pairs, in two stages:

    1. vectorized margin prefilter — candidates join their vectors and a
       numpy row-wise dot drops everything below threshold − 6e-5 (covers the
       round-4 half-step plus float error). This is what keeps verification
       cheap even when a candidate generator floods (LSH on data below its
       separable regime can emit a large fraction of all pairs).
    2. bit-stable JVM confirmation — survivors (output-sized by construction)
       are re-scored with the sequential-fold cosine rounded to 4 digits, the
       same expression the naive formulation used, so the final rows are
       value-identical to an exact engine replaying the pipeline."""
    import pandas as pd  # noqa: F401

    from pyspark.sql import types as T

    a = emb.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("av"))
    b = emb.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("bv"))
    withv = cand.join(a, "a_id").join(b, "b_id")
    thresh = min_sim_x10k / 10000.0 - 6e-5

    def gen(batches):
        import numpy as np
        import pandas as _pd

        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array(list(pdf["av"]), dtype=np.float64)
            B = np.array(list(pdf["bv"]), dtype=np.float64)
            sims = np.einsum("ij,ij->i", A, B) / (
                np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
            )
            keep = sims >= thresh
            yield _pd.DataFrame(
                {
                    "a_id": pdf["a_id"].to_numpy(dtype=np.int64)[keep],
                    "b_id": pdf["b_id"].to_numpy(dtype=np.int64)[keep],
                }
            )

    pre_schema = T.StructType(
        [T.StructField("a_id", T.LongType()), T.StructField("b_id", T.LongType())]
    )
    pre = withv.mapInPandas(gen, pre_schema)

    av = emb.select(
        F.col(id_col).alias("a_id"), F.col(vec_col).alias("av"), _norm(F.col(vec_col)).alias("an")
    )
    bv = emb.select(
        F.col(id_col).alias("b_id"), F.col(vec_col).alias("bv"), _norm(F.col(vec_col)).alias("bn")
    )
    sim = F.round(_dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")), 4)
    return (
        F.broadcast(pre)
        .join(av, "a_id")
        .join(bv, "b_id")
        .select("a_id", "b_id", sim.alias("sim"))
        .filter(F.col("sim") >= F.lit(min_sim_x10k) / F.lit(10000.0))
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    min_sim_x10k: int = 9000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_chunks: int = 16,
) -> DataFrame:
    """EXACT embedding-cosine near-duplicate pairs: all (a < b) with
    round(cosine, 4)·10⁴ ≥ threshold.

    All-pairs is O(n²) by definition, but HOW the n² is spent matters: the
    round-1 formulation evaluated interpreted higher-order aggregates per
    pair (~µs each). Here the corpus is hashed into ``n_chunks`` blocks,
    block PAIRS are enumerated (C(C+1)/2 rows, each carrying two vector
    blocks), and each block pair is scored by ONE numpy float64 matmul inside
    mapInPandas — Arrow-batched, no per-row Python, memory bounded by two
    blocks per task, no driver collect. Pairs within 6e-5 of the threshold
    (covering the round-4 half-step plus matmul error) are then CONFIRMED by
    the bit-stable JVM expression, so the result is value-identical to the
    naive join. At 100 TB this operator is still quadratic — use
    ``lsh_neardup_pairs`` (the scale path) unless exactness is mandatory."""
    import pandas as pd  # noqa: F401 (mapInPandas batches)

    from pyspark.sql import types as T

    chunked = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_chunks)).alias("ck"),
    )
    blocks = chunked.groupBy("ck").agg(
        F.collect_list(F.struct(F.col("id"), F.col("vec"))).alias("blk")
    )
    pairs = (
        blocks.select(F.col("ck").alias("a_ck"), F.col("blk").alias("a_blk"))
        .join(
            blocks.select(F.col("ck").alias("b_ck"), F.col("blk").alias("b_blk")),
            F.col("a_ck") <= F.col("b_ck"),
        )
        .repartition(n_chunks * (n_chunks + 1) // 2)
    )
    thresh = min_sim_x10k / 10000.0 - 6e-5

    def gen(batches):
        import numpy as np

        for pdf in batches:
            a_ids, b_ids = [], []
            for a_blk, b_blk, same in zip(
                pdf["a_blk"], pdf["b_blk"], pdf["a_ck"] == pdf["b_ck"]
            ):
                ai = np.array([r["id"] for r in a_blk], dtype=np.int64)
                bi = np.array([r["id"] for r in b_blk], dtype=np.int64)
                A = np.array([r["vec"] for r in a_blk], dtype=np.float64)
                B = np.array([r["vec"] for r in b_blk], dtype=np.float64)
                an = np.linalg.norm(A, axis=1)
                bn = np.linalg.norm(B, axis=1)
                sims = (A @ B.T) / np.outer(an, bn)
                ia, ib = np.nonzero(sims >= thresh)
                lo = np.minimum(ai[ia], bi[ib])
                hi = np.maximum(ai[ia], bi[ib])
                keep = lo < hi  # drops self-pairs; same-chunk dups dedup below
                a_ids.append(lo[keep])
                b_ids.append(hi[keep])
            import pandas as _pd

            yield _pd.DataFrame(
                {
                    "a_id": np.concatenate(a_ids) if a_ids else np.array([], dtype=np.int64),
                    "b_id": np.concatenate(b_ids) if b_ids else np.array([], dtype=np.int64),
                }
            )

    cand_schema = T.StructType(
        [T.StructField("a_id", T.LongType()), T.StructField("b_id", T.LongType())]
    )
    cand = pairs.mapInPandas(gen, cand_schema).distinct()
    return _verify_pairs(cand, emb, id_col, vec_col, min_sim_x10k)


def lsh_neardup_pairs(
    emb: DataFrame,
    min_sim_x10k: int = 9000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_tables: int = 16,
    nbits: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup at scale: ``n_tables`` independent hyperplane-LSH
    tables of ``nbits`` bits; a pair is a candidate if it shares a bucket in
    ANY table; candidates are confirmed with the exact rounded cosine. The
    shuffle key is (table, bucket) — work scales with bucket sizes, not n².

    Recall at cosine s: p = 1 - acos(s)/π per plane, 1-(1-p^nbits)^n_tables
    overall. The defaults target the NEAR-DUPLICATE population: ≈0.93 at
    s=0.9, ≈0.995 at s=0.95, →1 above. Below s≈0.7 hyperplane bits separate
    poorly (p barely moves between a 0.3 and a 0.5 pair), so low-threshold
    searches degrade toward all-pairs candidates — that regime belongs to
    ``embedding_neardup_pairs`` (exact blocked matmul); the margin prefilter
    in the verifier keeps even a flooded candidate set cheap to confirm.
    Precision is 1: verification is exact. Deterministic across engines via
    integer-quantized projections (module docstring)."""
    planes = hyperplanes(dim, n_tables * nbits, seed)
    sig = _lsh_signatures(emb, id_col, vec_col, planes, nbits)
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .distinct()
    )
    return _verify_pairs(cand, emb, id_col, vec_col, min_sim_x10k)


def _quantize(vec):
    """Integer-quantize an array<float>: floor(v·2²⁰) per component, exact in
    IEEE double. All downstream sums/dots over these stay < 2⁵³, so double
    arithmetic on them is EXACT — order-independent, engine-independent."""
    return F.transform(vec, lambda x: F.floor(x.cast("double") * _QSCALE).cast("long"))


def train_centroids(
    emb: DataFrame,
    n_cells: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd (k-means) refinement of the coarse quantizer, on
    integer-quantized vectors. Returns (cell, cv array<long>, cnrm double).

    Seeding is the n_cells lowest-id vectors (relabelled 0..n_cells-1) — the
    round-1 'toy quantizer' — but each Lloyd round reassigns every vector to
    its max-cosine centroid and recomputes centroids as the component-wise
    integer mean, so the final cells track the data distribution. Everything
    is exact integer arithmetic viewed through doubles (components ≤ 2²⁰,
    per-cell sums ≤ 2⁵³): assignment cosines, means and norms come out
    bit-identical in any engine, which is what lets the DuckDB oracle
    replicate the full training loop value-for-value. Cells that lose all
    members keep their previous centroid.

    Physical shape per round: one broadcast of C centroids into the corpus
    scan (assignment, no shuffle of the corpus) + one (cell, pos) aggregate —
    map-side partial, C·dim groups. At 10^10 vectors each round is a scan +
    a tiny aggregate; n_iters is a small constant (quality plateaus fast for
    a coarse quantizer whose only job is cell routing)."""
    from pyspark.sql import Window

    q = emb.select(F.col(id_col).alias("id"), _quantize(F.col(vec_col)).alias("qv"))
    w0 = Window.orderBy("id")
    cents = (
        q.orderBy("id")
        .limit(n_cells)
        .select((F.row_number().over(w0) - 1).alias("cell"), F.col("qv").alias("cv"))
    )
    for _ in range(max(0, n_iters)):
        cn = cents.select("cell", "cv", _norm(F.col("cv")).alias("cnrm"))
        sim = F.round(
            _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * F.col("cnrm")), 4
        )
        wv = Window.partitionBy("id").orderBy(F.desc("csim"), F.asc("cell"))
        asg = (
            q.crossJoin(F.broadcast(cn))
            .select("id", "qv", "cell", sim.alias("csim"))
            .withColumn("rn", F.row_number().over(wv))
            .filter(F.col("rn") == 1)
            .select("qv", "cell")
        )
        comp = (
            asg.select("cell", F.posexplode("qv").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("c"))
        )
        newc = (
            comp.select(
                "cell",
                "pos",
                # floor of the exact double quotient — both engines compute
                # the identical IEEE division on exact integer inputs
                F.floor(F.col("s") / F.col("c")).cast("long").alias("cmp"),
            )
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cmp"))),
                    lambda s: s["cmp"],
                ).alias("cv")
            )
        )
        cents = (
            cents.select("cell", F.col("cv").alias("_prev"))
            .join(newc, "cell", "left")
            .select("cell", F.coalesce("cv", "_prev").alias("cv"))
        )
    return cents.select("cell", "cv", _norm(F.col("cv")).alias("cnrm"))


def assign_cells(
    emb: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iters: int = 2,
    cents: DataFrame | None = None,
) -> DataFrame:
    """Assign every vector to its max-cosine trained centroid (cosine of the
    integer-quantized vector against the integer centroid, rounded to 4
    digits, ties broken by cell id — reproducible in any engine). Pass
    ``cents`` (from ``train_centroids``) to reuse an already-trained
    quantizer."""
    if cents is None:
        cents = train_centroids(emb, n_cells, n_iters, id_col, vec_col)
    base = emb.select(
        F.col(id_col),
        F.col(vec_col),
        _norm(F.col(vec_col)).alias("_nrm"),
        _quantize(F.col(vec_col)).alias("_qv"),
    )
    sim = F.round(_dot(F.col("_qv"), F.col("cv")) / (_norm(F.col("_qv")) * F.col("cnrm")), 4)
    scored = base.crossJoin(F.broadcast(cents)).select(
        F.col(id_col), F.col(vec_col), F.col("_nrm"), F.col("cell"), sim.alias("csim")
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, "_nrm", "cell")
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
    query. Recall < 1 by design; the exact baseline is cosine_topk. The
    coarse quantizer is Lloyd-trained (``train_centroids``) — trained ONCE
    and shared by the index assignment and the query probes. All norms are
    computed once per vector; every comparison is on the rounded cosine
    (deterministic cross-engine)."""
    cents = train_centroids(emb, n_cells, id_col=id_col, vec_col=vec_col)
    cents = cents.localCheckpoint(eager=True)  # tiny; consumed by 2 branches
    cells = assign_cells(emb, n_cells, id_col, vec_col, cents=cents)
    qbase = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
        _quantize(F.col(vec_col)).alias("qq"),
    )
    qsim = F.round(_dot(F.col("qq"), F.col("cv")) / (_norm(F.col("qq")) * F.col("cnrm")), 4)
    from pyspark.sql import Window

    wq = Window.partitionBy("query_id").orderBy(F.desc("qsim"), F.asc("cell"))
    probes = (
        qbase.crossJoin(F.broadcast(cents))
        .select("query_id", "qv", "qn", "cell", qsim.alias("qsim"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "qn", "cell")
    )
    cand = probes.join(
        cells.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            F.col("_nrm").alias("cn"),
            "cell",
        ),
        "cell",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    sim = F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 4)
    wr = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cand.select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def lsh_bucket_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nbits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH top-k: corpus and queries bucketed by an nbits
    sign signature; each query scores only same-bucket candidates. Search
    cost ≈ |corpus| / 2^nbits per query under even buckets; recall < 1
    (baseline: cosine_topk). ``dim`` is a parameter — no driver-side probe of
    the data, and the quantized-integer projections keep the signature
    expression compact and portable at any dimensionality."""
    from pyspark.sql import Window

    planes = hyperplanes(dim, nbits, seed)
    csig = _lsh_signatures(emb, id_col, vec_col, planes, nbits).select(
        F.col("id").alias("neighbor_id"), F.col("bkt").alias("bucket")
    )
    qsig = _lsh_signatures(queries, id_col, vec_col, planes, nbits).select(
        F.col("id").alias("query_id"), F.col("bkt").alias("bucket")
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    ).join(csig, "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    ).join(qsig, "query_id")
    cand = F.broadcast(q).join(c, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    sim = F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 4)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cand.select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
