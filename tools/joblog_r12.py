"""Parse a Spark event log into a per-job timeline (round-12 measurement
aid, guide §1/§7): for each job — submission time, duration, driver gap
since the previous job finished, and the job description/call site. The
gaps expose driver think-time (planning, localCheckpoint barriers, Python
staging) that per-query wall timings can't attribute.

Usage: python tools/joblog_r12.py <event-log-file> [desc-filter]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    path = sys.argv[1]
    flt = sys.argv[2] if len(sys.argv) > 2 else None
    jobs: dict[int, dict] = {}
    if path.endswith(".zstd"):
        import io

        import zstandard

        opener = lambda p: io.TextIOWrapper(  # noqa: E731
            zstandard.ZstdDecompressor().stream_reader(open(p, "rb"))
        )
    else:
        opener = open
    with opener(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerJobStart":
                props = ev.get("Properties", {}) or {}
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "desc": props.get("spark.job.description")
                    or props.get("callSite.short", ""),
                    "stages": len(ev.get("Stage IDs", [])),
                }
            elif ev.get("Event") == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
    prev_end = None
    t0 = None
    total_run = total_gap = 0
    for jid in sorted(jobs):
        j = jobs[jid]
        if "end" not in j:
            continue
        if flt and flt not in (j["desc"] or ""):
            prev_end = j["end"]
            continue
        if t0 is None:
            t0 = j["start"]
        dur = (j["end"] - j["start"]) / 1000.0
        gap = (j["start"] - prev_end) / 1000.0 if prev_end is not None else 0.0
        total_run += dur
        total_gap += max(0.0, gap)
        print(
            f"job {jid:4d}  t+{(j['start'] - t0) / 1000.0:8.2f}s  "
            f"dur {dur:7.3f}s  gap {gap:7.3f}s  stages {j['stages']}  {j['desc'][:100]}"
        )
        prev_end = j["end"]
    print(f"-- total job run {total_run:.2f}s, total inter-job gap {total_gap:.2f}s")


if __name__ == "__main__":
    main()
