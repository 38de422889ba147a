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


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_jaccard_bp: int = 2000,
) -> DataFrame:
    """All pairs (a < b) with char-n-gram Jaccard ≥ threshold (basis points,
    exact integer arithmetic). Candidate generation via inverted shingle
    index; a pair is only compared if it shares ≥1 shingle."""
    sh = with_shingles(docs, id_col, text_col, n)
    sized = sh.select("id", "shingles", F.size("shingles").alias("n_sh"))
    inv = sized.select("id", "n_sh", F.explode("shingles").alias("sh"))
    a, b = inv.alias("a"), inv.alias("b")
    pairs = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jac = F.floor(
        F.col("common") * F.lit(10000) / (F.col("na") + F.col("nb") - F.col("common"))
    )
    return pairs.select("a_id", "b_id", jac.alias("jaccard_bp")).filter(
        F.col("jaccard_bp") >= min_jaccard_bp
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    k: int = 32,
    seed: int = 42,
) -> DataFrame:
    """k-permutation MinHash signature per doc, fully JVM-side:
    sig_j = min over shingles of (a_j * (xxhash64(s) mod p) + b_j) mod p."""
    sh = with_shingles(docs, id_col, text_col, n)

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
    LSH recall trade-off)."""
    rows = k // bands
    sig = minhash_signatures(docs, id_col, text_col, n, k, seed)
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
    exact = ngram_jaccard_pairs(docs, id_col, text_col, n, min_jaccard_bp)
    return cand.join(exact, ["a_id", "b_id"]).select("a_id", "b_id", "jaccard_bp")


def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over whitespace tokens: bit j of the signature is the
    sign of Σ_tokens (±1 by bit j of xxhash64(token))."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    bit_sum = lambda j: F.aggregate(  # noqa: E731
        hashes,
        F.lit(0),
        lambda acc, h: acc
        + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
    )
    sig = None
    for j in range(64):
        bit = F.when(bit_sum(j) > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << j).cast("long") if j < 63 else bit * F.lit(-(1 << 63))
        sig = term if sig is None else (sig + term)
    return docs.select(F.col(id_col).alias("id"), sig.alias("simhash"))


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
