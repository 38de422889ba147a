"""Snapshot-version retention: WHICH table versions to keep or clean.

Re-expresses the reference's version-selection/retention policy surface
(gobblin-data-management/.../retention/policy/NewestKRetentionPolicy.java:39,
TimeBasedRetentionPolicy.java:48, CombineRetentionPolicy.java UNION/INTERSECT,
and the selection side gobblin-data-management/.../policy/
NewestKSelectionPolicy.java:140, SelectBeforeTimeBasedPolicy.java /
SelectAfterTimeBasedPolicy.java) over the snapshot table's version history.

A "dataset version" here is one committed manifest (``meta/vNNNNNN.json``)
plus the data dirs it references. Policies are pure functions over the
version list — deterministic, unit-testable without Spark — and
``apply_retention`` turns a policy verdict into the same safe deletion
``expire_snapshots`` performs: the CURRENT version is always protected, a
data dir is removed only when no surviving manifest references it. Policy
evaluation is driver-side over manifest metadata only (O(versions), no data
scan) — version counts are bounded by retention itself, so this never
becomes a scale problem the way per-bucket listdir did.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

from .lake import SnapshotTable, resolve_bucket_index


@dataclass(frozen=True)
class VersionInfo:
    version: int
    committed_at: float  # unix seconds (0.0 for pre-timestamp manifests)
    data_dirs: frozenset[str] = field(default_factory=frozenset)
    is_current: bool = False
    shard_files: frozenset[str] = field(default_factory=frozenset)


def list_versions(table: SnapshotTable) -> list[VersionInfo]:
    """Version history, NEWEST FIRST (the order the reference's policies
    contractually receive — NewestKSelectionPolicy.java:140)."""
    meta = os.path.join(table.root, "meta")
    current = table.version
    out = []
    for f in os.listdir(meta):
        if not (f.startswith("v") and f.endswith(".json")):
            continue
        with open(os.path.join(meta, f)) as fh:
            m = json.load(fh)
        bmap, shard_refs = resolve_bucket_index(table.root, m)
        dirs = set()
        for e in bmap.values():
            for ent in e if isinstance(e, list) else [e]:
                dirs.add(ent["data"])
        out.append(
            VersionInfo(
                version=int(m["version"]),
                committed_at=float(m.get("committed_at", 0.0)),
                data_dirs=frozenset(dirs),
                is_current=int(m["version"]) == current,
                shard_files=frozenset(shard_refs),
            )
        )
    return sorted(out, key=lambda v: v.version, reverse=True)


# ------------------------------------------------------------------ policies
class RetentionPolicy:
    """Returns the versions to DELETE from a newest-first history."""

    def deletable(self, versions: list[VersionInfo]) -> set[int]:
        raise NotImplementedError


class NewestKRetentionPolicy(RetentionPolicy):
    """Keep the newest ``k`` versions, delete the rest
    (≈ NewestKRetentionPolicy.java:39)."""

    def __init__(self, k: int):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k

    def deletable(self, versions: list[VersionInfo]) -> set[int]:
        return {v.version for v in versions[self.k :]}


class TimeBasedRetentionPolicy(RetentionPolicy):
    """Delete versions committed more than ``max_age_s`` ago
    (≈ TimeBasedRetentionPolicy.java:48 lookback). ``now`` is injectable
    for tests; pre-timestamp manifests (committed_at 0.0) count as old."""

    def __init__(self, max_age_s: float, now: float | None = None):
        self.max_age_s = max_age_s
        self.now = now

    def deletable(self, versions: list[VersionInfo]) -> set[int]:
        cutoff = (self.now if self.now is not None else time.time()) - self.max_age_s
        return {v.version for v in versions if v.committed_at < cutoff}


class CombineRetentionPolicy(RetentionPolicy):
    """UNION (delete what ANY child deletes) or INTERSECT (delete only what
    ALL children delete) of child policies (≈ CombineRetentionPolicy.java
    DeletableCombineOperation). INTERSECT is the usual production combo:
    'delete only versions that are BOTH old AND beyond the newest k'."""

    def __init__(self, policies: list[RetentionPolicy], op: str = "intersect"):
        if op not in ("union", "intersect"):
            raise ValueError(f"unknown combine op: {op}")
        if not policies:
            raise ValueError("no child policies")
        self.policies = policies
        self.op = op

    def deletable(self, versions: list[VersionInfo]) -> set[int]:
        sets = [p.deletable(versions) for p in self.policies]
        out = sets[0]
        for s in sets[1:]:
            out = (out | s) if self.op == "union" else (out & s)
        return out


# ------------------------------------------------------- selection policies
class NewestKSelectionPolicy:
    """Select the newest ``k`` versions — or everything BUT them with
    ``exclude=True`` (≈ NewestKSelectionPolicy.java select/exclude modes;
    the exclude mode is how 'clean all but newest k' is usually phrased)."""

    def __init__(self, k: int, exclude: bool = False):
        self.k, self.exclude = k, exclude

    def select(self, versions: list[VersionInfo]) -> list[VersionInfo]:
        newest = versions[: self.k]
        if not self.exclude:
            return newest
        chosen = {v.version for v in newest}
        return [v for v in versions if v.version not in chosen]


class SelectBeforeTimeBasedPolicy:
    """Versions committed before ``ts`` (≈ SelectBeforeTimeBasedPolicy.java)."""

    def __init__(self, ts: float):
        self.ts = ts

    def select(self, versions: list[VersionInfo]) -> list[VersionInfo]:
        return [v for v in versions if v.committed_at < self.ts]


class SelectAfterTimeBasedPolicy:
    """Versions committed at/after ``ts`` (≈ SelectAfterTimeBasedPolicy.java)."""

    def __init__(self, ts: float):
        self.ts = ts

    def select(self, versions: list[VersionInfo]) -> list[VersionInfo]:
        return [v for v in versions if v.committed_at >= self.ts]


# ------------------------------------------------------------------- apply
def apply_retention(table: SnapshotTable, policy: RetentionPolicy) -> list[int]:
    """Evaluate ``policy`` over the table's version history and delete the
    verdict — with the two safety rails the reference's cleaner also has:
    the current version is NEVER deleted (even if the policy names it), and
    a data dir is removed only when no surviving manifest references it.
    Returns the removed version numbers."""
    versions = list_versions(table)
    doomed = set(policy.deletable(versions)) - {v.version for v in versions if v.is_current}
    if not doomed:
        return []
    keep_dirs: set[str] = set()
    keep_shards: set[str] = set()
    for v in versions:
        if v.version not in doomed:
            keep_dirs |= v.data_dirs
            keep_shards |= v.shard_files
    meta = os.path.join(table.root, "meta")
    removed = []
    for v in sorted(doomed):
        os.unlink(os.path.join(meta, f"v{v:06d}.json"))
        removed.append(v)
    shards_dir = os.path.join(meta, "shards")
    if os.path.isdir(shards_dir):
        for fn in os.listdir(shards_dir):
            if f"meta/shards/{fn}" not in keep_shards:
                os.unlink(os.path.join(shards_dir, fn))
    data = os.path.join(table.root, "data")
    if os.path.isdir(data):
        for d in os.listdir(data):
            if f"data/{d}" not in keep_dirs:
                shutil.rmtree(os.path.join(data, d), ignore_errors=True)
    return removed
