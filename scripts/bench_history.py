"""Append the scaling-session history section to BENCH.md.

`scaling_bench.py` rewrites BENCH.md wholesale on every run; this script
re-appends the audit trail — one row per recorded session JSON in
`bench_sessions/` (session-local floors, paired medians, run counts) plus
the host-envelope forensics. Run it after every scaling_bench session:

    python scripts/scaling_bench.py ... && python scripts/bench_history.py

Two session formats exist:
- round-4+ (`scaling_r4_*`): every run carries (session, round, index)
  provenance and the headline `scaling_efficiency` IS the paired median;
  session-local rows select runs by their own session id — no value
  matching, no double counting.
- round-3 (`scaling_2026-08-17/18T*`): flat `runs_sec` lists, some sessions
  pooled earlier ones; the `_POOLED_FROM` map backs those out (by value —
  the historical format recorded nothing better). These rows are kept as
  history of the older code revision; they are never pooled into new floors.
"""

from __future__ import annotations

import glob
import json
import os
import statistics

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# sessions recorded before the footer-statistics planner (commit a6b82bb)
# ran older code whose plan phase scanned the changelog twice per replay
_PRE_FOOTER = {
    "scaling_2026-08-17T19.json",
    "scaling_2026-08-17T20.json",
    "scaling_2026-08-17T21.json",
}
# legacy sessions that POOLED prior sessions carry merged run lists; map each
# to the sessions it pooled so session-local rows can be backed out
_POOLED_FROM = {
    "scaling_2026-08-18T00.json": [
        "scaling_2026-08-17T23.json",
        "scaling_2026-08-17T23-probe.json",
    ],
    "scaling_2026-08-18T01.json": [
        "scaling_2026-08-17T23.json",
        "scaling_2026-08-17T23-probe.json",
        "scaling_2026-08-18T00.json",
    ],
}


def _legacy_runs(d: dict, level: str) -> list[float]:
    return list(d["levels"][level]["runs_sec"])


def _post_tmpfs(sha: str) -> bool:
    """Did this session run with the job workdir on tmpfs (commit 5072673)?
    Pre-fix sessions timed the VM's shared-disk writeback, which taxes the
    4N side asymmetrically — a different measurement regime."""
    import subprocess

    try:
        return (
            subprocess.run(
                ["git", "-C", REPO, "merge-base", "--is-ancestor", "5072673", sha],
                capture_output=True,
                timeout=20,
            ).returncode
            == 0
        )
    except OSError:
        return False


def session_rows() -> list[tuple]:
    files = {
        os.path.basename(f): json.load(open(f))
        for f in sorted(glob.glob(os.path.join(REPO, "bench_sessions", "*.json")))
        if os.path.getsize(f) > 0
    }
    rows = []
    for name, d in files.items():
        if "floor" in d:  # round-4+ provenance format
            own = d["session"]
            nr = [
                r["apply_sec"]
                for r in d["levels"]["1"]["runs"]
                if r.get("session") == own
            ]
            fr = [
                r["apply_sec"]
                for r in d["levels"]["4"]["runs"]
                if r.get("session") == own
            ]
            if not nr or not fr:
                continue
            sha = d.get("git_sha", "?")
            has_canary = any("membw_pre" in r for r in d.get("rounds", []))
            tag = f"r4 provenance ({sha}"
            tag += ", tmpfs workdir" if _post_tmpfs(sha) else ", PRE-tmpfs-fix workdir"
            tag += ", bus canary)" if has_canary else ")"
            # recompute quiet from raw per-round signals under the CURRENT
            # calibration (scaling_bench._round_quiet) so one rule applies
            # across the whole table — stored flags reflect whichever
            # calibration was in force when each session ran
            import sys as _sys

            _sys.path.insert(0, os.path.join(REPO, "scripts"))
            from scaling_bench import _round_quiet

            q = [r["efficiency"] for r in d.get("rounds", []) if _round_quiet(r)]
            qn = len(q)
            qmed = round(statistics.median(q), 3) if q else None
            rows.append(
                (
                    own,
                    tag,
                    len(nr),
                    len(fr),
                    min(nr),
                    min(fr),
                    f"{qmed} over {qn}q" if qmed is not None else (
                        f"— ({qn} quiet)" if qn is not None else "—"),
                    d["scaling_efficiency"],  # all-rounds paired median
                    round(min(nr) / min(fr) / 4, 3),
                )
            )
            continue
        # ---- legacy (round-3) format
        nr, fr = _legacy_runs(d, "1"), _legacy_runs(d, "4")
        for prior in _POOLED_FROM.get(name, []):
            if prior in files:
                for v in _legacy_runs(files[prior], "1"):
                    if v in nr:
                        nr.remove(v)
                for v in _legacy_runs(files[prior], "4"):
                    if v in fr:
                        fr.remove(v)
        if not nr or not fr:
            continue
        code = "scan planning (pre-footer)" if name in _PRE_FOOTER else "footer-stats planning"
        if "probe" in name:
            code += " (standalone probe pair)"
        pm = d.get("scaling_efficiency_paired_median")
        if pm is None and name in ("scaling_2026-08-17T19.json", "scaling_2026-08-17T20.json"):
            pm = d["scaling_efficiency"]  # pre-floor sessions stored the paired median here
        label = name.replace("scaling_2026-08-", "").replace(".json", "")
        rows.append(
            (
                label,
                code,
                len(nr),
                len(fr),
                min(nr),
                min(fr),
                "—",  # legacy sessions recorded no quietness signals
                pm if pm is not None else "—",
                round(min(nr) / min(fr) / 4, 3),
            )
        )
    return rows


def main() -> None:
    rows = session_rows()
    r4 = [r for r in rows if str(r[1]).startswith("r4")]
    lines = [
        "",
        "## Session history (identical 10M-event input per session)",
        "",
        "Every protocol session, session-local numbers (raw JSONs committed in",
        "`bench_sessions/`). Round-4 sessions carry per-run provenance",
        "(session id, round, git SHA, steal, loadavg; bus-canary sessions add",
        "inter-round membw) and the QUIET-round median is the session's",
        "PASS/FAIL number (>= 2 quiet rounds required; INCONCLUSIVE",
        "otherwise); the 2026-08-17/18 legacy",
        "rows ran older code (pre-r4 planner or pre-footer planner) under the",
        "older floor-headline protocol and are kept as history only — they are",
        "never pooled into current estimates (the pooler refuses git-SHA",
        "mismatches).",
        "",
        "| session | code | runs N/4N | floor N (s) | floor 4N (s) | quiet median | paired median (all rounds) | session floor eff |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r[0]} | {r[1]} | {r[2]}/{r[3]} | {r[4]} | {r[5]} | {r[6]} | {r[7]} | {r[8]} |"
        )
    if r4:
        meds = [r[7] for r in r4]
        post = [r[7] for r in r4 if "PRE-tmpfs" not in str(r[1])]
        pre = [r[7] for r in r4 if "PRE-tmpfs" in str(r[1])]
        lines += [
            "",
            f"Round-4 paired medians across {len(r4)} independent session(s): "
            f"{sorted(meds)} (median of medians = "
            f"{statistics.median(meds):.3f}).",
            "",
            "Regime split — the tmpfs-workdir fix (commit 5072673) removed the",
            "VM's ~139 MB/s shared-disk writeback from the measurement (real",
            "executors bring their own disks; dirty-page throttling taxed the",
            "4N side ~3x harder per second):",
            f"- pre-fix sessions (disk workdir): medians {sorted(pre)}" if pre else "",
            f"- post-fix sessions (tmpfs workdir): medians {sorted(post)} — "
            "sessions whose rounds carry steal are biased low (see the quiet-"
            "round criterion at the top of this file); per-round steal is in "
            "each session JSON."
            if post
            else "",
        ]
    lines += [
        "",
        "Host-envelope context: this is a shared VM whose memory-bandwidth",
        "envelope moves between rounds (scripts/membw_probe.py; 9.9-25.9 GB/s",
        "single-process across 2026-08-17/18). A pure-CPU probe (cache-resident",
        "sha256, scripts/ see BENCH notes) shows per-core throughput drops only",
        "~8% from 1 to 4 pinned cores, so the hardware supports >=0.9 scaling",
        "for compute-bound work; bandwidth contention is what the paired",
        "discipline controls for.",
        "",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write("\n".join(lines))
    print(f"appended {len(rows)} session rows to BENCH.md")


if __name__ == "__main__":
    main()
