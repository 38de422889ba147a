"""Unit tests for the scaling-bench estimator plumbing (no Spark).

The round-3 audit (ADVICE.md) required: paired-median decides PASS, floor is
supplementary, runs carry provenance, and pooling refuses sessions recorded
under different measured-job code. Round 4 anchors job identity to a content
digest over the repo-local import closure of replay_job.py instead of the
whole-repo git SHA — commits outside the closure (new operators, docs,
tests) cannot change what the benchmark measures, so they must not block
pooling.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import scaling_bench as sb  # noqa: E402


def test_job_closure_is_the_replay_import_graph():
    files = sb._job_closure_files()
    # everything replay_job.py actually executes
    for needed in (
        "scripts/replay_job.py",
        "gobblin_spark/engine.py",
        "gobblin_spark/lake.py",
        "gobblin_spark/dedup.py",
        "gobblin_spark/extract.py",
        "gobblin_spark/datagen.py",  # decides the replayed bytes
        "gobblin_spark/session.py",
    ):
        assert needed in files, needed
    # modules the replay job never imports — commits here must not block
    # pooling of scaling sessions
    for unrelated in (
        "gobblin_spark/operators/similarity.py",
        "gobblin_spark/operators/textstats.py",
        "gobblin_spark/iceberg_backend.py",
        "gobblin_spark/retention.py",
        "gobblin_spark/avro_codec.py",
    ):
        assert unrelated not in files, unrelated


def test_job_digest_deterministic_and_sha_addressable():
    files = sb._job_closure_files()
    d1 = sb._job_digest(files)
    d2 = sb._job_digest(files)
    assert d1 == d2
    assert len(d1) == 16 and all(c in "0123456789abcdef" for c in d1)
    # the git-show path hashes the same content the same way
    at_head = sb._job_digest(files, "HEAD")
    assert len(at_head) == 16
    # digest must be sensitive to content: hashing a different file set differs
    assert sb._job_digest(files[:-1]) != d1


def test_job_digest_differs_across_job_code_revisions():
    """Two historical SHAs known to differ inside the closure (lake.py
    changed between them) must yield different digests; the same SHA must
    yield the same digest twice."""
    files = sb._job_closure_files()
    a = sb._job_digest(files, "HEAD")
    b = sb._job_digest(files, "HEAD")
    assert a == b
    # find a commit that touched a closure file; skip if history is shallow
    import subprocess

    out = subprocess.run(
        ["git", "-C", REPO, "log", "--format=%h", "-2", "--", "gobblin_spark/lake.py"],
        capture_output=True,
        text=True,
        timeout=20,
    )
    shas = out.stdout.split()
    if len(shas) == 2:
        assert sb._job_digest(files, shas[0]) != sb._job_digest(files, f"{shas[0]}~1")


def test_floor_corroboration_requires_independent_pair():
    runs = [
        {"apply_sec": 100.0, "session": "s1", "round": 0},
        {"apply_sec": 104.0, "session": "s1", "round": 1},  # within 10% → corroborated
        {"apply_sec": 150.0, "session": "s2", "round": 0},
    ]
    r = sb._floor_corroboration(runs)
    assert r["corroborated"] and r["min"] == 100.0 and r["next_best"] == 104.0
    # same (session, round) as the minimum must NOT corroborate it
    runs2 = [
        {"apply_sec": 100.0, "session": "s1", "round": 0},
        {"apply_sec": 101.0, "session": "s1", "round": 0},
        {"apply_sec": 180.0, "session": "s2", "round": 1},
    ]
    r2 = sb._floor_corroboration(runs2)
    assert not r2["corroborated"]
