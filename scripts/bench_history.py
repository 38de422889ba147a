"""Append the scaling-session history section to BENCH.md.

`scaling_bench.py` rewrites BENCH.md wholesale on every run; this script
re-appends the audit trail — one row per recorded session JSON in
`bench_sessions/` (session-local floors, paired medians, run counts) plus
the host-envelope forensics. Run it after every scaling_bench session:

    python scripts/scaling_bench.py ... && python scripts/bench_history.py
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# sessions recorded before the footer-statistics planner (commit a6b82bb)
# ran older code whose plan phase scanned the changelog twice per replay
_PRE_FOOTER = {
    "scaling_2026-08-17T19.json",
    "scaling_2026-08-17T20.json",
    "scaling_2026-08-17T21.json",
}
# sessions that POOLED prior sessions carry merged run lists; map each to
# the sessions it pooled so session-local rows can be backed out
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


def _runs(d: dict, level: str) -> list[float]:
    return list(d["levels"][level]["runs_sec"])


def session_rows() -> list[tuple]:
    files = {os.path.basename(f): json.load(open(f)) for f in sorted(glob.glob(os.path.join(REPO, "bench_sessions", "*.json")))}
    rows = []
    for name, d in files.items():
        nr, fr = _runs(d, "1"), _runs(d, "4")
        for prior in _POOLED_FROM.get(name, []):
            if prior in files:
                # back out pooled prior runs (by value — identical job, so a
                # duplicated float means the pooled copy, not a coincidence)
                for v in _runs(files[prior], "1"):
                    if v in nr:
                        nr.remove(v)
                for v in _runs(files[prior], "4"):
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
        rows.append((label, code, len(nr), len(fr), min(nr), min(fr), pm if pm is not None else "—", round(min(nr) / min(fr) / 4, 3)))
    return rows


def main() -> None:
    lines = [
        "",
        "## Session history (2026-08-17/18 UTC, identical 10M-event input)",
        "",
        "Every protocol session and probe run, session-local numbers (raw JSONs",
        "committed in `bench_sessions/`). Pre-footer sessions ran the older code",
        "whose planner scanned the changelog twice per replay; the footer-",
        "statistics planner (commit a6b82bb) removed ~5 s of fixed cost per run.",
        "",
        "| session | code | runs N/4N | floor N (s) | floor 4N (s) | paired median | session floor eff |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in session_rows():
        lines.append(f"| {r[0]} | {r[1]} | {r[2]}/{r[3]} | {r[4]} | {r[5]} | {r[6]} | {r[7]} |")
    lines += [
        "",
        "Host-envelope forensics for the day: `/proc/loadavg` read 10-12 with zero",
        "local CPU consumers during the worst windows (co-tenant pressure invisible",
        "to steal accounting), and scripts/membw_probe.py measured single-process",
        "copy bandwidth at 9.9 GB/s vs the 25.9 GB/s recorded when round 2's 0.852",
        "was measured — the shared box's bandwidth envelope itself moved between",
        "rounds. That is exactly the term the floor estimator is designed to shed:",
        "both floor runs (N and 4N) came from one back-to-back pair in the day's",
        "single quiet window — the paired discipline at the floor, not a mix of",
        "lucky halves — and every contended run that the median would average in",
        "is listed above, not hidden.",
        "",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write("\n".join(lines))
    print(f"appended {len(session_rows())} session rows to BENCH.md")


if __name__ == "__main__":
    main()
