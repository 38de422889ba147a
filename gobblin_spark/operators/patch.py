"""Partial-column-update (patch) CDC merge — Debezium/Maxwell-style change
events where an update carries only the columns that changed (unchanged
columns arrive NULL) and a delete is a tombstone that resets the row.

The reference folds full-row images with a lexicographic delta comparator
(gobblin-compaction/.../avro/AvroKeyDedupReducer.java:82-93 — "keep one
record per key, max over delta fields"); real binlog/WAL feeds additionally
ship *partial* images (MySQL binlog-row-image=minimal, Debezium
ExtractNewRecordState with null-for-unchanged), which a plain LWW fold would
corrupt: the last event wins wholesale and NULLs out every column it did not
carry. The correct fold is **per-column last non-null, restarted at the last
tombstone**:

    row exists  ⇔  some live event is versioned after the last delete
    col value   =  the col's last non-null patch, if that patch is after
                   the last delete; else NULL (never written since re-create)

Physical plan (Spark-first, single pass): one hash aggregate per key with
three families of conditional struct-max aggregates —

    D    = max(when(is_delete,              struct(version)))
    L    = max(when(live,                   struct(version)))
    C[c] = max(when(live AND c IS NOT NULL, struct(version, c)))

Struct comparison is lexicographic in Spark, NULL inputs are ignored by
``max``, so each aggregate is an ordinary map-side-combinable max: hot keys
emit ≤1 partial row per input partition BEFORE the shuffle (same skew
guarantee as dedup.lww_latest). The key insight that makes one pass
sufficient: the globally-last non-null patch for a column either sorts after
the last delete — in which case it IS the last-after-delete patch (anything
after the delete sorts ≤ the global last) — or it sorts before, in which
case no patch for that column exists after the delete at all.

The contract oracle (``__spark_entry__.py``) recomputes the same semantics in
DuckDB with an INDEPENDENT algorithm: a window-max tombstone cursor plus
ordered+filtered ``last()`` aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def patch_fold_state(
    df: DataFrame,
    key_cols: list[str],
    version_cols: list[str],
    patch_cols: list[str],
    is_delete: Column,
) -> DataFrame:
    """The single-pass fold state per key — the shared core of
    ``patch_merge`` (standalone operator) and the engine's ``fold="patch"``
    ingest mode (which must ALSO see keys whose last event is a tombstone,
    so nothing is filtered here).

    Returns one row per key: ``key_cols`` +
    ``_d`` (version struct of the last tombstone, NULL if none),
    ``_l`` (version struct of the last live event, NULL if none),
    ``_c_<col>`` (struct(v, x): version + value of the col's last
    NON-NULL patch, NULL if the col was never written in ``df``).
    Every aggregate is a map-side-combinable conditional struct-max, so hot
    keys emit ≤1 partial per input split before the shuffle."""
    ver = F.struct(*[F.col(c) for c in version_cols])
    live = ~is_delete

    aggs = [
        F.max(F.when(is_delete, ver)).alias("_d"),
        F.max(F.when(live, ver)).alias("_l"),
    ]
    for c in patch_cols:
        aggs.append(
            F.max(
                F.when(live & F.col(c).isNotNull(), F.struct(ver.alias("v"), F.col(c).alias("x")))
            ).alias(f"_c_{c}")
        )
    return df.groupBy(*key_cols).agg(*aggs)


def patch_merge(
    df: DataFrame,
    key_cols: list[str],
    version_cols: list[str],
    patch_cols: list[str],
    is_delete: Column,
) -> DataFrame:
    """Fold a partial-image changelog into final row state per key.

    Parameters
    ----------
    df            changelog of patch events (one row per event).
    key_cols      upsert key.
    version_cols  total order within a key (e.g. ``["ts", "event_id"]``).
    patch_cols    payload columns carrying partial images (NULL = unchanged).
    is_delete     boolean Column marking tombstone events.

    Returns one row per surviving key: ``key_cols`` + ``patch_cols`` (each
    the last-non-null value written after the key's last tombstone, NULL if
    never re-written) + ``last_version_cols`` prefixed ``last_`` (the
    version of the last live event).
    """
    agg = patch_fold_state(df, key_cols, version_cols, patch_cols, is_delete)

    after_del = lambda v: F.col("_d").isNull() | (v > F.col("_d"))  # noqa: E731
    alive = F.col("_l").isNotNull() & after_del(F.col("_l"))

    out_cols = list(key_cols)
    for c in patch_cols:
        cand = F.col(f"_c_{c}")
        out_cols.append(
            F.when(cand.isNotNull() & after_del(cand["v"]), cand["x"]).alias(c)
        )
    for vc in version_cols:
        out_cols.append(F.col("_l")[vc].alias(f"last_{vc}"))
    return agg.filter(alive).select(*out_cols)
