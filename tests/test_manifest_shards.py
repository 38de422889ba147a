"""Sharded manifest persistence (format v2, the Iceberg manifest-list model).

What must hold (ref: Iceberg's manifest-list reuse, which the reference's
IcebergMetadataWriter relies on via the table format; repo analog
lake.py:_commit):
- a commit touching k buckets rewrites only the shard files containing those
  buckets — every other shard is carried forward BY REFERENCE (same relpath
  in consecutive manifests);
- a re-opened table (fresh process) reads identical state;
- sharded and inline tables produce identical query results for the same
  commit sequence;
- retention/expiry resolves shard pointers when computing live data dirs
  (a sharded manifest's raw JSON has no `buckets` key — treating it as empty
  would GC live data), and GCs shard files no surviving manifest references.
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gobblin_spark.lake import SnapshotTable
from gobblin_spark.retention import NewestKRetentionPolicy, apply_retention

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("rank", T.LongType()),
    ]
)


def _updates(spark, ids, ts_base=1_700_000_000):
    rows = [
        (f"https://ex.com/{i}", i, ts_base + i, i, False) for i in ids
    ]
    df = spark.createDataFrame(
        rows, "url string, rank long, ts long, _version_off long, _deleted boolean"
    )
    return df.select(
        "url",
        "rank",
        F.col("ts").cast("timestamp").alias("_version_ts"),
        "_version_off",
        "_deleted",
    )


def _raw_manifest(root, version):
    with open(os.path.join(root, "meta", f"v{version:06d}.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def pair(spark, tmp_path_factory):
    """(sharded, inline) tables driven through the same commit sequence."""
    base = tmp_path_factory.mktemp("shards")
    sharded = SnapshotTable.create(
        spark, str(base / "sharded"), SCHEMA, key="url", n_buckets=32, manifest_shards=8
    )
    inline = SnapshotTable.create(
        spark, str(base / "inline"), SCHEMA, key="url", n_buckets=32
    )
    for batch in (range(0, 200), range(100, 260), range(40, 60)):
        u = _updates(sharded.spark, batch)
        sharded.merge(u, mode="delta")
        inline.merge(u, mode="delta")
    return sharded, inline


def test_sharded_reads_match_inline(pair):
    sharded, inline = pair
    a = sorted(sharded.read().collect())
    b = sorted(inline.read().collect())
    assert a == b and len(a) == 260


def test_reopened_table_sees_identical_state(pair, spark):
    sharded, _ = pair
    fresh = SnapshotTable(spark, sharded.root)
    assert fresh.version == sharded.version
    assert fresh.manifest()["buckets"] == sharded.manifest()["buckets"]
    assert sorted(fresh.read().collect()) == sorted(sharded.read().collect())


def test_commit_rewrites_only_touched_shards(pair, spark):
    sharded, _ = pair
    n_shards = 8
    before_v = sharded.version
    before = _raw_manifest(sharded.root, before_v)["bucket_shards"]
    # one single-key batch touches exactly one bucket => exactly one shard
    sharded.merge(_updates(spark, [7], ts_base=1_800_000_000), mode="delta")
    after = _raw_manifest(sharded.root, sharded.version)["bucket_shards"]
    changed = [s for s in map(str, range(n_shards)) if before[s] != after[s]]
    unchanged = [s for s in map(str, range(n_shards)) if before[s] == after[s]]
    assert len(changed) == 1, f"expected 1 rewritten shard, got {changed}"
    assert len(unchanged) == n_shards - 1
    # carried-forward pointers reference the SAME file (reuse, not rewrite)
    for s in unchanged:
        assert after[s] == before[s]
    # and the rows landed
    got = sharded.read().filter(F.col("url") == "https://ex.com/7").collect()
    assert got[0]["rank"] == 7


def test_raw_manifest_has_no_inline_index(pair):
    sharded, _ = pair
    raw = _raw_manifest(sharded.root, sharded.version)
    assert "buckets" not in raw
    assert set(raw["bucket_shards"]) == {str(s) for s in range(8)}


def test_expire_snapshots_gcs_unreferenced_shards_only(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="url", n_buckets=16, manifest_shards=4
    )
    for i in range(4):
        t.merge(_updates(spark, range(i * 10, i * 10 + 10)), mode="delta")
    shards_dir = os.path.join(t.root, "meta", "shards")
    n_before = len(os.listdir(shards_dir))
    removed = t.expire_snapshots(keep_last=2)
    assert removed
    live = {
        rel
        for v in (t.version - 1, t.version)
        for rel in _raw_manifest(t.root, v)["bucket_shards"].values()
    }
    on_disk = {f"meta/shards/{f}" for f in os.listdir(shards_dir)}
    assert on_disk == live
    assert len(on_disk) < n_before
    # table still fully readable after expiry
    assert t.read().count() == 40


def test_pruned_read_is_shard_lazy(spark, tmp_path):
    """A fresh process reading k buckets must open O(k) shard files, not the
    whole index — the property that keeps driver metadata IO O(touched) at
    10^6 buckets (round-3 verdict #4)."""
    from gobblin_spark.lake import LazyBucketIndex

    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="url", n_buckets=32, manifest_shards=8
    )
    t.merge(_updates(spark, range(200)), mode="delta")
    fresh = SnapshotTable(spark, t.root)
    idx = fresh.manifest()["buckets"]
    assert isinstance(idx, LazyBucketIndex)
    assert idx.shard_opens == 0, "manifest() alone must read no shards"
    fresh.read(buckets=[5])
    assert idx.shard_opens == 1  # bucket 5 -> shard 5 only
    fresh.read(buckets=[5, 13])  # 13 % 8 == 5: same shard, cached
    assert idx.shard_opens == 1
    fresh.read(buckets=[6])
    assert idx.shard_opens == 2
    # full read loads everything — and still answers correctly
    assert fresh.read().count() == 200


def test_delta_commit_loads_only_touched_shards(spark, tmp_path):
    """A 1-bucket delta commit from a cold process loads exactly the shard
    holding that bucket (prior-generation lookup + shard rewrite), carrying
    the other shards by pointer without ever opening them."""
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="url", n_buckets=32, manifest_shards=8
    )
    t.merge(_updates(spark, range(200)), mode="delta")
    fresh = SnapshotTable(spark, t.root)
    idx = fresh.manifest()["buckets"]
    fresh.merge(_updates(spark, [7], ts_base=1_900_000_000), mode="delta")
    assert idx.shard_opens == 1, f"expected 1 shard open, got {idx.shard_opens}"
    # the committed in-memory view answers without re-reading written shards
    reread = SnapshotTable(spark, t.root)
    got = reread.read().filter(F.col("url") == "https://ex.com/7").collect()
    assert len(got) == 1 and got[0]["rank"] == 7


def test_metadata_only_commit_opens_no_shards(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="url", n_buckets=32, manifest_shards=8
    )
    t.merge(_updates(spark, range(50)), mode="delta")
    fresh = SnapshotTable(spark, t.root)
    idx = fresh.manifest()["buckets"]
    fresh.update_properties({"watermark_note": "x"})
    assert idx.shard_opens == 0, "property commit must carry all shard pointers"
    assert SnapshotTable(spark, t.root).properties["watermark_note"] == "x"


def test_changes_between_prunes_at_shard_pointer_level(spark, tmp_path):
    """Manifest-diff for changes_between compares shard POINTERS first:
    shards carried by reference between the two snapshots are never opened —
    driver diff cost is O(changed shards), and the change set is exact."""
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="url", n_buckets=32, manifest_shards=8
    )
    t.merge(_updates(spark, range(200)), mode="delta")
    t.merge(_updates(spark, [7], ts_base=1_900_000_000), mode="delta")
    fresh = SnapshotTable(spark, t.root)
    m1, m2 = fresh.manifest_at(1), fresh.manifest_at(2)
    changed = fresh.changed_buckets(m1, m2)
    # exactly the one bucket url 7 hashes to
    b = (
        fresh.spark.createDataFrame([("https://ex.com/7",)], "url string")
        .select(fresh.bucket_expr("url").alias("b"))
        .collect()[0]["b"]
    )
    assert changed == [b]
    # only the differing shard was opened on each side
    assert m1["buckets"].shard_opens == 1 and m2["buckets"].shard_opens == 1
    # and the classified delta over those buckets is the single update
    ch = t.changes_between(1, 2).collect()
    assert [(r["url"], r["_change_type"]) for r in ch] == [("https://ex.com/7", "update")]


def test_retention_policy_resolves_shard_pointers(spark, tmp_path):
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="url", n_buckets=16, manifest_shards=4
    )
    for i in range(3):
        t.merge(_updates(spark, range(i * 5, i * 5 + 5)), mode="delta")
    removed = apply_retention(t, NewestKRetentionPolicy(k=1))
    assert removed
    # live data dirs referenced via shard pointers must have survived
    assert t.read().count() == 15
