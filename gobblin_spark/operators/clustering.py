"""Duplicate-CLUSTER construction over near-dup candidate pairs: distributed
connected components via the alternating large-star / small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14).

The dedup families (exact / jaccard / minhash / simhash / embedding) emit
PAIRS; a real training-data pipeline needs GROUPS — "these 40 URLs are all
the same boilerplate page, keep one". Pairs→groups is connected components,
and at 10^10 documents the naive approaches fail:

- driver-side union-find needs every edge on the driver — not distributed;
- plain label propagation (l(v) ← min over neighbors) converges in
  O(diameter) rounds: a 10^6-long chain of near-dup pages (common for
  paginated boilerplate) needs 10^6 shuffles.

Large-star/small-star converges in O(log n) rounds on ANY graph topology
and each round is two hash-partitioned aggregations + joins over the edge
set — the shape that survives 100×. Each round strictly shrinks the sum of
component-internal edge "heights"; on dedup graphs (dense, small-diameter
clusters) it converges in 2-4 rounds.

Per-round physical plan: groupBy(u).min(v) (map-side partial combine) and a
shuffle-hash join of edges against the per-node min — both keyed on u, so
AQE coalesces them into one exchange lineage. Each round's edge set is
``localCheckpoint``-ed: an iterative algorithm without lineage truncation
re-executes every previous round per action (module-docstring discipline in
dedup_families.py). Convergence is detected with a metadata-sized action
(count + hash-sum fingerprint), not a collect of the edge set.

No reference counterpart file — Gobblin's dedup (compaction reducer) is
key-equality only; this module is brief-driven (LLM training-data ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon_edges(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Canonical (u > v) long edges, self-loops dropped, deduplicated."""
    e = pairs.select(
        F.col(a_col).cast("long").alias("_a"), F.col(b_col).cast("long").alias("_b")
    ).filter(F.col("_a") != F.col("_b"))
    return e.select(
        F.greatest("_a", "_b").alias("u"), F.least("_a", "_b").alias("v")
    ).distinct()


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    """Metadata-sized convergence probe: (|E|, order-independent hash-sum).
    The sum runs in decimal(38,0) — a long sum of 64-bit hashes overflows
    under ANSI mode."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("hs"),
    ).first()
    return int(row["n"]), int(row["hs"])


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_rounds: int = 30,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; component is
    the MINIMUM node id of the connected component (deterministic canonical
    representative). Alternating large-star/small-star; raises if the edge
    set hasn't stabilised after ``max_rounds`` (log₂ of any feasible n is
    < 64, so 30 rounds only trips on a logic error, not on scale)."""
    edges = _canon_edges(pairs, a_col, b_col).localCheckpoint(eager=True)
    prev = _fingerprint(edges)
    if prev[0] == 0:
        return edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    for _ in range(max_rounds):
        # LARGE-STAR: over the symmetrised neighborhood of u, let
        # m = min(N(u) ∪ {u}); connect every neighbor LARGER than u to m.
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least("_mn", "u").alias("m"))
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            # v > u ≥ m ⇒ emitted edge (v, m) keeps the u > v canonical form
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # SMALL-STAR: edges already point large→small; for each u let
        # m = min(N(u)); connect every smaller neighbor AND u itself to m.
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(mins2.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        edges = small.localCheckpoint(eager=True)
        cur = _fingerprint(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    # Fixpoint edge set is a star forest: (node, root). Roots appear only on
    # the v side — union them in as their own component members.
    comp = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("node")).distinct()
    return comp.unionByName(
        roots.select("node", F.col("node").alias("component"))
    ).distinct()


def dup_clusters(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """Cluster roll-up for dedup decisions: one row per duplicate cluster
    (size ≥ 2 by construction — singletons never appear in pairs) with the
    canonical keeper (min id) and the member count. Downstream keep-list =
    anti-join of the corpus against (members minus keepers)."""
    cc = connected_components(pairs, a_col, b_col)
    return cc.groupBy(F.col("component").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("node").alias("keep_id"),
    )


def cluster_representatives(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """Per-cluster keeper selection — the decision step that turns duplicate
    CLUSTERS into a dedup action: within each connected component keep the
    single best document (max ``weight_col``, ties to the smallest id — the
    "longest document wins" rule of CC pipeline dedup), drop the rest.

    Returns one row per CLUSTERED document:
    (id_col, cluster_id, weight_col, keep boolean). Unclustered documents
    never appear (they are trivially kept); the production keep-list is
    ``corpus LEFT ANTI JOIN (this WHERE NOT keep)``.

    Physical plan: components via O(log n)-round star contraction
    (``connected_components``); the weight lookup joins components (a tiny
    fraction of the corpus — only docs that appear in a pair) against the
    corpus on the doc id, and the winner is a map-side-combinable
    ``max_by`` per cluster joined back broadcast (clusters ≪ corpus).
    """
    cc = connected_components(pairs, a_col, b_col)  # (node, component)
    # members is consumed twice (winner agg + join-back) and is tiny — only
    # docs appearing in a pair; checkpoint so the component roll-up and the
    # docs join don't run twice (same policy as the jaccard prefix postings)
    members = cc.join(
        docs.select(F.col(id_col).alias("node"), F.col(weight_col).alias("_w")),
        "node",
    ).localCheckpoint(eager=False)
    winners = members.groupBy("component").agg(
        F.max_by("node", F.struct(F.col("_w"), (-F.col("node")).alias("_t"))).alias(
            "_keep"
        )
    )
    return (
        members.join(F.broadcast(winners), "component")
        .select(
            F.col("node").alias(id_col),
            F.col("component").alias("cluster_id"),
            F.col("_w").alias(weight_col),
            (F.col("node") == F.col("_keep")).alias("keep"),
        )
    )
