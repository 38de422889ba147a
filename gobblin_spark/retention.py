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
    contractually receive — NewestKSelectionPolicy.java:140). Every named-ref
    head (branch/tag) is flagged ``is_current`` alongside main's head, so the
    retention rail that protects the current version protects live history
    lines too (Iceberg expire_snapshots' branch/tag protection)."""
    meta = os.path.join(table.root, "meta")
    protected = {int(r["version"]) for r in table.refs().values()}
    protected.add(table.version)  # a branch handle protects its own head too
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
                is_current=int(m["version"]) in protected,
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


def _newest_mtime(path: str) -> float:
    """Most recent mtime under ``path`` (the path itself for files). A
    crashed Spark write leaves a ``_temporary`` tree whose leaves may be
    newer than the top dir's mtime, so the grace check must see them."""
    newest = os.path.getmtime(path)
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                newest = max(newest, os.path.getmtime(os.path.join(root, f)))
            except OSError:
                pass
    return newest


def remove_orphans(
    table: SnapshotTable, grace_s: float = 86400.0, now: float | None = None
) -> dict:
    """Delete table-root entries referenced by NO retained manifest and
    untouched for at least ``grace_s`` seconds — the engine's analogue of
    Iceberg's ``remove_orphan_files`` action (which defaults to a 3-day
    grace for the same reason) and the reference's dataset cleaner
    (gobblin-data-management/.../retention/DatasetCleaner.java).

    What strands orphans: the commit protocol is write-data-then-swap-pointer
    (lake.py:341-344), so a crash between the two leaves a fully-written but
    unreferenced ``data/vNNNNNN`` dir (possibly with a Spark ``_temporary``
    tree), a ``meta/shards/*.tmp`` half-written shard, or an mkstemp stray in
    ``meta/`` — all invisible to readers, all permanent disk leaks until
    cleaned. ``apply_retention``/``expire_snapshots`` only sweep when they
    delete versions; this op sweeps unconditionally.

    The grace window is the correctness rail: a commit IN FLIGHT has already
    written its data dir but not yet swapped the pointer, so "unreferenced"
    alone is not deletable — "unreferenced AND quiescent for grace_s" is.
    Never deletes manifests, the ``_current`` pointer, or anything a retained
    manifest references.

    Scale shape: driver-side metadata op — O(versions x generations) manifest
    union (shards load lazily per manifest) + one listdir of ``data/`` and
    ``meta/shards/``; the recursive mtime walk runs only on orphan
    CANDIDATES, which are few by construction (one per crash). No data scan.
    """
    cutoff = (time.time() if now is None else now) - grace_s
    versions = list_versions(table)
    keep_dirs: set[str] = set()
    keep_shards: set[str] = set()
    for v in versions:
        keep_dirs |= v.data_dirs
        keep_shards |= v.shard_files
    removed_dirs: list[str] = []
    removed_files: list[str] = []
    kept_recent: list[str] = []

    data = os.path.join(table.root, "data")
    if os.path.isdir(data):
        for d in sorted(os.listdir(data)):
            rel = f"data/{d}"
            if rel in keep_dirs:
                continue
            full = os.path.join(data, d)
            if _newest_mtime(full) >= cutoff:
                kept_recent.append(rel)
                continue
            if os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)
                removed_dirs.append(rel)
            else:
                os.unlink(full)
                removed_files.append(rel)

    meta = os.path.join(table.root, "meta")
    shards_dir = os.path.join(meta, "shards")
    if os.path.isdir(shards_dir):
        for fn in sorted(os.listdir(shards_dir)):
            rel = f"meta/shards/{fn}"
            if rel in keep_shards:
                continue
            full = os.path.join(shards_dir, fn)
            if os.path.getmtime(full) >= cutoff:
                kept_recent.append(rel)
                continue
            os.unlink(full)
            removed_files.append(rel)
    # mkstemp / .tmp strays from crashed pointer or manifest writes; the
    # whitelist (manifests, pointer, shards dir) is never touched
    if os.path.isdir(meta):
        for fn in sorted(os.listdir(meta)):
            if not (fn.endswith(".tmp") or fn.startswith("tmp")):
                continue
            full = os.path.join(meta, fn)
            if not os.path.isfile(full):
                continue
            if os.path.getmtime(full) >= cutoff:
                kept_recent.append(f"meta/{fn}")
                continue
            os.unlink(full)
            removed_files.append(f"meta/{fn}")
    return {
        "removed_dirs": removed_dirs,
        "removed_files": removed_files,
        "kept_recent": kept_recent,
    }
