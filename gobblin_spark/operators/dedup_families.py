"""Document deduplication families for web-scale training-data pipelines:
exact, n-gram Jaccard, MinHash+LSH, SimHash.

Design for 100 TB:
- exact dedup is a hash-groupBy (map-side combine; no full-row shuffle — only
  (digest, id) pairs move);
- n-gram Jaccard builds candidate pairs through an inverted shingle index
  (explode → self-join on shingle) — never a full cross join;
- MinHash signatures are computed per-row with higher-order array expressions
  (JVM codegen, no Python), and LSH banding turns near-dup search into an
  equi-join on (band, band_hash) — the shuffle key is the bucket, so work
  scales with bucket sizes, not n²;
- SimHash is a per-row 64-bit signature + block-banded candidate join.

All hashing is explicit modular arithmetic over xxhash64 with fixed seeded
coefficients — deterministic across runs and cluster sizes.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_P = 2_147_483_647  # Mersenne prime 2^31-1


def _coeffs(k: int, seed: int = 42) -> list[tuple[int, int]]:
    rnd = random.Random(seed)
    return [(rnd.randrange(1, _P), rnd.randrange(0, _P)) for _ in range(k)]


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Group identical texts by digest; keep the smallest id as canonical."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def with_shingles(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """(id, shingles array<string>) with distinct character n-grams,
    as a single JVM-side array expression (sequence → transform → distinct)."""
    t = F.col(text_col)
    arr = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1))),
        lambda i: t.substr(i, F.lit(n)),
    )
    return docs.select(F.col(id_col).alias("id"), F.array_distinct(arr).alias("shingles"))


def _sized_shingles(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingles, n_sh), persisted — the shared base for candidate
    generation, signatures, and verification (computed once per query)."""
    sh = with_shingles(docs, id_col, text_col, n)
    return sh.select("id", "shingles", F.size("shingles").alias("n_sh")).persist()


def _exact_jaccard(cand: DataFrame, sized: DataFrame) -> DataFrame:
    """Verify candidate pairs (a_id, b_id) exactly on the full shingle sets:
    common = |a ∩ b| via array_intersect, Jaccard in basis points (exact
    integer arithmetic)."""
    av = sized.select(
        F.col("id").alias("a_id"), F.col("shingles").alias("a_sh"), F.col("n_sh").alias("na")
    )
    bv = sized.select(
        F.col("id").alias("b_id"), F.col("shingles").alias("b_sh"), F.col("n_sh").alias("nb")
    )
    verified = cand.join(av, "a_id").join(bv, "b_id")
    common = F.size(F.array_intersect(F.col("a_sh"), F.col("b_sh")))
    jac = F.floor(common * F.lit(10000) / (F.col("na") + F.col("nb") - common))
    return verified.select("a_id", "b_id", jac.alias("jaccard_bp"))


def _prefix_candidates(sized: DataFrame, t_bp: int) -> DataFrame:
    """Prefix-filtered candidate pairs (AllPairs/PPJoin): for Jaccard ≥ t, two
    sets must share at least one of each set's first |d| - ceil(t·|d|) + 1
    shingles when every doc's shingles are ordered by ascending global
    document frequency. Only those prefix shingles are indexed, so the
    self-join buckets are the RAREST shingles — the high-df shingle blowup
    (quadratic in docs-per-shingle) that kills a naive inverted index at web
    scale never happens."""
    from pyspark.sql import Window

    posting = sized.select("id", "n_sh", F.explode("shingles").alias("sh"))
    dfreq = posting.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    prefix_len = F.col("n_sh") - F.ceil(F.col("n_sh") * F.lit(t_bp) / F.lit(10000)) + 1
    w = Window.partitionBy("id").orderBy("df", "sh")
    prefix = (
        posting.join(dfreq, "sh")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= prefix_len)
        .select("id", "n_sh", "sh")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    # length filter: t·|a| ≤ |b| ≤ |a|/t is necessary for Jaccard ≥ t
    return (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("b.n_sh") * F.lit(10000) >= F.col("a.n_sh") * F.lit(t_bp))
            & (F.col("a.n_sh") * F.lit(10000) >= F.col("b.n_sh") * F.lit(t_bp)),
        )
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_jaccard_bp: int = 2000,
) -> DataFrame:
    """All pairs (a < b) with char-n-gram Jaccard ≥ threshold (basis points).
    EXACT result: prefix-filtered candidates, verified on full shingle sets."""
    sized = _sized_shingles(docs, id_col, text_col, n)
    cand = _prefix_candidates(sized, min_jaccard_bp)
    return _exact_jaccard(cand, sized).filter(F.col("jaccard_bp") >= min_jaccard_bp)


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    k: int = 32,
    seed: int = 42,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """k-permutation MinHash signature per doc, fully JVM-side:
    sig_j = min over shingles of (a_j * (xxhash64(s) mod p) + b_j) mod p.
    Pass ``shingled`` (id, shingles, …) to reuse an already-computed base."""
    sh = shingled if shingled is not None else with_shingles(docs, id_col, text_col, n)

    def perm_min(aj: int, bj: int):
        return F.array_min(
            F.transform(
                F.col("shingles"),
                lambda s: F.pmod(
                    F.lit(aj) * F.pmod(F.xxhash64(s), F.lit(_P)) + F.lit(bj), F.lit(_P)
                ),
            )
        )

    sig_cols = [
        perm_min(aj, bj).alias(f"mh_{j}") for j, (aj, bj) in enumerate(_coeffs(k, seed))
    ]
    return sh.select("id", F.array(*sig_cols).alias("signature"))


def minhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    k: int = 32,
    bands: int = 8,
    seed: int = 42,
    min_jaccard_bp: int | None = 2000,
) -> DataFrame:
    """LSH banding: bucket on (band index, hash of signature slice), join
    within buckets → candidate pairs; optionally verify candidates with exact
    n-gram Jaccard (removes LSH false positives; false negatives are the usual
    LSH recall trade-off). Verification computes Jaccard ONLY for the LSH
    candidates — it never runs the full all-pairs search."""
    rows = k // bands
    sized = _sized_shingles(docs, id_col, text_col, n)
    sig = minhash_signatures(docs, id_col, text_col, n, k, seed, shingled=sized)
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.slice("signature", b * rows + 1, rows)).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bh")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .distinct()
    )
    if min_jaccard_bp is None:
        return cand
    return _exact_jaccard(cand, sized).filter(F.col("jaccard_bp") >= min_jaccard_bp)


def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over whitespace tokens: bit j of the signature is the
    sign of Σ_tokens (±1 by bit j of xxhash64(token)).

    Physical shape: explode tokens → hash once per token → 64 columnar
    conditional sums in ONE hash aggregate (map-side partial, whole-stage
    codegen). One pass over the tokens, vs 64 array traversals had the bit
    sums been nested higher-order aggregates."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("_tok"),
    ).select("id", F.xxhash64("_tok").alias("_h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_s{j}")
        for j in range(64)
    ]
    sums = toks.groupBy("id").agg(*bit_sums)
    sig = None
    for j in range(64):
        bit = F.when(F.col(f"_s{j}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << j).cast("long") if j < 63 else bit * F.lit(-(1 << 63))
        sig = term if sig is None else (sig + term)
    return sums.select("id", sig.alias("simhash"))


def simhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
) -> DataFrame:
    """Block-banded SimHash near-dup search: 4 blocks of 16 bits — any pair
    within hamming distance ≤ 16/4·… shares at least one exact block (pigeonhole
    for d < 4); candidates verified by popcount of xor."""
    sig = simhash(docs, id_col, text_col)
    blocks = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftrightunsigned(F.col("simhash"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bv"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("id", "simhash", "bb.blk", "bb.bv")
    a, b = blocks.alias("a"), blocks.alias("b")
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    hamming = F.bit_count(xor)
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"), hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
