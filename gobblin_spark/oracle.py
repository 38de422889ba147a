"""Single-threaded Python oracle for final-table state (FIXTURES.md §5).

Semantics mirror the reference's last-writer-wins dedup reducer
(gobblin-compaction/.../mapreduce/RecordKeyDedupReducerBase.java:58-76 — keep
the record with max delta fields) folded over the full changelog: an event
applies iff its version ``(warc_ts, log_offset)`` is greater than the current
version for its url; ``D`` leaves a tombstone that remembers its version, so a
later-offset update with an *older* warc_ts cannot resurrect the row.

Because the fold keeps a running max, the final state per url equals the
argmax event by (warc_ts, log_offset) — which is exactly what the engine's
batch LWW dedup + guarded MERGE computes distributively.
"""

from __future__ import annotations

import pandas as pd

TOMBSTONE = None


def reduce_changelog(
    changelog: pd.DataFrame, initial_pages: pd.DataFrame | None = None
) -> pd.DataFrame:
    """Fold events in per-partition offset order; return the expected final
    visible table (url, warc_ts, html, lang[, extra cols], log_offset)."""
    state: dict[str, tuple[tuple, dict | None]] = {}
    if initial_pages is not None:
        for row in initial_pages.to_dict("records"):
            ver = (row["warc_ts"], -1)
            state[row["url"]] = (ver, {**row, "log_offset": -1})

    extra = [
        c
        for c in changelog.columns
        if c not in ("log_partition", "log_offset", "op", "url", "warc_ts", "html", "lang")
    ]
    ordered = changelog.sort_values(["log_partition", "log_offset"], kind="stable")
    for row in ordered.to_dict("records"):
        ver = (row["warc_ts"], row["log_offset"])
        cur = state.get(row["url"])
        if cur is not None and ver <= cur[0]:
            continue
        if row["op"] == "D":
            state[row["url"]] = (ver, TOMBSTONE)
        else:
            keep = {
                "url": row["url"],
                "warc_ts": row["warc_ts"],
                "html": row["html"],
                "lang": row["lang"],
                "log_offset": row["log_offset"],
            }
            for c in extra:
                keep[c] = row[c]
            state[row["url"]] = (ver, keep)

    rows = [r for (_, r) in state.values() if r is not TOMBSTONE]
    cols = ["url", "warc_ts", "html", "lang", "log_offset"] + extra
    if not rows:
        return pd.DataFrame(columns=cols)
    out = pd.DataFrame(rows)
    for c in cols:
        if c not in out.columns:
            out[c] = None
    return out[cols].sort_values("url").reset_index(drop=True)
