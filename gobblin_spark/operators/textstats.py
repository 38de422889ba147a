"""Text analysis over a documents table: token counting, quality scoring,
language-ID heuristic, fingerprinting.

Everything is built from JVM-side expressions (split / higher-order array
functions / md5) so it whole-stage-codegens — no Python in the hot path.
Ratios are returned as exact integers (basis points via integer division) so
results are bit-identical across engines (no float rounding hazards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]

# language marker words for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
    "es": ["el", "los", "y"],
    "zh": ["de", "shi", "le"],
}


def tokens_expr(col: str = "text"):
    return F.split(F.trim(F.col(col)), r"\s+")


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count + char count per document."""
    return docs.select(
        F.col(id_col),
        F.size(tokens_expr(text_col)).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars_text"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length / mean-token-length / stopword-ratio quality signals.

    Ratios are integer basis points (x10000, integer division) — exact."""
    toks = tokens_expr(text_col)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.floor(F.length(F.col(text_col)) * F.lit(10000) / n_tokens).alias("mean_token_len_bp"),
        F.floor(n_stop * F.lit(10000) / n_tokens).alias("stopword_bp"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic: count each language's marker tokens,
    pick the max (ties broken by language code order); 'und' when no marker
    hits. Deterministic CASE logic, reproducible in ANSI SQL."""
    toks = tokens_expr(text_col)

    def marker_count(markers: list[str]):
        arr = F.array(*[F.lit(x) for x in markers])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    counts = {lang: marker_count(markers) for lang, markers in LANG_MARKERS.items()}
    best_count = F.greatest(*counts.values())
    guess = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        guess = F.when(counts[lang] == best_count, F.lit(lang)).otherwise(guess)
    guess = F.when(best_count == 0, F.lit("und")).otherwise(guess)
    return docs.select(F.col(id_col), guess.alias("lang_guess"))


# GPT-2-style pre-tokenizer (simplified: no lookbehind/lookahead — the
# contraction alternates, then letter runs, digit runs, punctuation runs,
# whitespace runs). Deliberately restricted to constructs shared by Java
# regex and RE2 so an independent engine reproduces the counts exactly.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """BPE-ish pre-token count per document (the unit LLM tokenizers split
    before merges), alongside the whitespace token count — both JVM-side
    (regexp_count / split), no Python."""
    return docs.select(
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(BPE_PATTERN)).alias("n_bpe_pretokens"),
        F.size(tokens_expr(text_col)).alias("n_ws_tokens"),
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Duplicate-line ratio — the classic boilerplate/repetition quality
    signal for web text. Integer basis points, exact."""
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda ln: F.length(ln) > 0
    )
    n_lines = F.size(lines)
    n_dup = n_lines - F.size(F.array_distinct(lines))
    return docs.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        F.floor(n_dup * F.lit(10000) / F.greatest(n_lines, F.lit(1))).alias("dup_line_bp"),
    )


# PII patterns restricted (like BPE_PATTERN) to the Java-regex ∩ RE2 subset:
# char classes, bounded repetition, \b — identical leftmost-first matching in
# both engines, so counts AND replaced bytes reproduce exactly.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{3}-\d{3}-\d{4}",
}
PII_ORDER = ["email", "ipv4", "phone"]  # scrub order (applied sequentially)


def pii_scrub(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """PII redaction — the standard pre-training scrub pass. Counts each PII
    class, then replaces them with typed placeholders IN ORDER (email → ipv4
    → phone), each pattern matching the already-scrubbed text so classes
    can't double-fire on the same span. Whole-stage codegen: regexp_count +
    chained regexp_replace, no Python. Each class is COUNTED on the same text
    it is scrubbed from (the output of the previous class's replace), so the
    counts are exactly the number of placeholders inserted. Returns the
    scrubbed text's md5 (not the text) so a verifying engine checks
    byte-identity cheaply."""
    counts = []
    scrubbed = F.col(text_col)
    for k in PII_ORDER:
        counts.append(F.regexp_count(scrubbed, F.lit(PII_PATTERNS[k])).alias(f"n_{k}"))
        scrubbed = F.regexp_replace(scrubbed, PII_PATTERNS[k], f"<{k.upper()}>")
    return docs.select(F.col(id_col), *counts, F.md5(scrubbed).alias("scrubbed_md5"))


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit content fingerprint (hex md5 prefix) — the cheap exact-dup key."""
    return docs.select(
        F.col(id_col),
        F.substring(F.md5(F.col(text_col)), 1, 16).alias("fp64"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    rolling-hash scheme): hash every k-gram, slide a w-wide window over the
    hash sequence, keep each window's minimum — any shared substring of
    length ≥ k+w-1 between two documents is guaranteed to share a selected
    fingerprint. The per-doc output is the distinct fingerprint set, reduced
    to (count, xor-fold, min) so the verifying engine checks the exact set
    without shipping it.

    Physical shape: explode k-gram positions → hash once per k-gram → the
    window minimum as a length-w ROWS frame over pos → distinct → one
    aggregate. The tempting pure-array formulation (transform over slices of
    a hashed array) is a trap: Catalyst's project-collapse re-inlines the
    whole md5 array expression into every downstream reference and the plan
    goes super-linear (measured: minutes vs seconds at sf0.1 — same failure
    mode as the round-2 minhash rewrite). The exploded form computes every
    hash exactly once by construction, shuffles fixed-width (id, pos, hash)
    longs, and the frame min is a single sorted pass. A true O(1)-update
    rolling hash is a serial-CPU trick; batched substr+hash does the same
    work columnar and stays engine-portable (portable_hash60)."""
    from pyspark.sql import Window

    from .dedup_families import portable_hash60
    from .util import spread

    t = F.coalesce(F.col(text_col), F.lit(""))
    grams = spread(docs, id_col).select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1))),
                lambda i: t.substr(i, F.lit(k)),
            )
        ).alias("pos", "gram"),
    ).select("id", "pos", portable_hash60(F.col("gram")).alias("h"))
    wp = Window.partitionBy("id")
    wf = Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    wins = (
        grams.select(
            "id",
            "pos",
            F.count(F.lit(1)).over(wp).alias("n"),
            F.min("h").over(wf).alias("win_min"),
        )
        .filter((F.col("pos") <= F.col("n") - w) | ((F.col("n") < w) & (F.col("pos") == 0)))
        .select("id", "win_min")
        .distinct()
    )
    return wins.groupBy(F.col("id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_fp"),
        F.expr("bit_xor(win_min)").alias("fp_xor"),
        F.min("win_min").alias("fp_min"),
    )


def tfidf_keywords(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_len: int = 3,
    idf_scale: int = 1_000_000,
) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document — the cheap relevance signal
    a webtext pipeline attaches for retrieval/topic bucketing.

    Scoring is INTEGER-RATIONAL on purpose: ``score = tf * (N*scale // df)``
    with floor division, so the ranking is bit-identical on every engine —
    a float idf (log N/df) ranks identically in the common case but ties
    and 1-ulp libm differences across engines make float scores
    un-oracle-able. Monotonicity in (tf, 1/df) — the property that makes
    tf-idf work — is preserved exactly.

    Plan: tokenize in-row (lower + split, pure codegen), explode to
    (doc, term), ONE map-side-combinable count → tf; df = row count per
    term over the already-(doc,term)-unique tf table (no countDistinct);
    join tf⋈df on the term key; rank per doc. Three shuffles — term-key
    aggregation twice, doc-key window once — all map-side combinable or
    k-bounded; the text column never shuffles. N (corpus size) is a
    driver-side scalar: one count() action, metadata-sized.

    Output: (id_col, term, tf, df, score, rk) for ranks 1..k, ordered by
    (score desc, term asc) — deterministic total order."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), "[^a-z]+"),
                lambda t: F.length(t) >= min_len,
            )
        ).alias("term"),
    )
    n_docs = docs.count()
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_tab = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_tab, "term").withColumn(
        "score",
        F.col("tf") * F.expr(f"CAST({n_docs * idf_scale} AS BIGINT) div df"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            F.col("id").alias(id_col), "term", "tf", "df", "score",
            F.col("rk").cast("long").alias("rk"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    chunk_chars: int = 1000,
    overlap: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping fixed-width character chunks —
    the context-window preparation step of a training pipeline (long
    documents must become model-window-sized examples; the overlap
    preserves cross-boundary context).

    Chunk i covers [1 + i*stride, 1 + i*stride + chunk_chars) with
    stride = chunk_chars - overlap; the last chunk may be shorter. A
    document of length <= chunk_chars yields exactly one chunk; NULL or
    empty text yields one empty chunk (documents are never dropped —
    the same conservation contract as the span scrubber).

    n_chunks = 1 + ceil((len - chunk_chars)/stride) for longer docs, in
    pure integer arithmetic, so the chunking is engine-portable. Plan:
    sequence + transform + explode per row — whole-stage codegen, the
    text column never shuffles, no Python.
    """
    if overlap < 0 or overlap >= chunk_chars:
        raise ValueError(
            f"need 0 <= overlap < chunk_chars, got {overlap}/{chunk_chars}"
        )
    stride = chunk_chars - overlap
    text = F.coalesce(F.col(text_col), F.lit(""))
    ln = F.length(text)
    # ceil((len - chunk)/stride): operands < 2^31, double-exact on both
    # engines before the floor
    n_chunks = F.when(ln <= chunk_chars, F.lit(1)).otherwise(
        F.lit(1)
        + F.floor((ln - chunk_chars + stride - 1) / F.lit(stride)).cast("long")
    )
    return docs.select(
        F.col(id_col),
        ln.cast("long").alias("doc_len"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), n_chunks.cast("int")),
                lambda i: F.substring(
                    text, ((i - 1) * stride + 1).cast("int"), chunk_chars
                ),
            )
        ).alias("chunk_id", "chunk_text"),
    ).withColumn("chunk_len", F.length("chunk_text").cast("long"))


def token_vocabulary(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 1000,
    min_len: int = 1,
) -> DataFrame:
    """Corpus token vocabulary — the top-k tokens by frequency (the
    tokenizer-training / stopword-discovery input). Tokenization is the
    same portable lower+split rail as tfidf_keywords; ranking is fully
    deterministic via the (count desc, token asc) total order, so the
    exact vocabulary is oracle-checkable.

    Plan: in-row tokenize (codegen) → explode → ONE map-side-combinable
    count per token → global top-k as TakeOrdered (per-partition top-k +
    driver merge, never a full sort). Output: (token, n_occurrences,
    rank 1..k)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), "[^a-z]+"),
                lambda t: F.length(t) >= min_len,
            )
        ).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n_occurrences"))
    from pyspark.sql import Window

    ranked = (
        counts.orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
            ).cast("long"),
        )
    )
    return ranked
