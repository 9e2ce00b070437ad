#!/usr/bin/env python
"""Summarize scripts/bench_sweep*.sh logs into one table.

Usage: python scripts/analyze_sweep.py [log ...]   (default /tmp/bench_sweep.log;
multiple logs merge into one ranked table. Logs are ordered by file mtime —
NOT argv order, which for a glob is lexicographic (sweep10 before sweep2) —
and for duplicate tags the newest successful (rc=0) run wins; a failed run
never overrides a successful one, and every override is warned on stderr.)

Each sweep section looks like:
    --- <tag> (ENV=...) HH:MM:SS ---
    bench: ... stderr diagnostics ...
    {"metric": ..., "value": N, ...}
    rc=0 for <tag>
This prints tag, frames/s, stage-1/stage-2 ms, residual px, and any
render/stream lines, sorted fastest-first, plus the shipped-default
recommendation rule (fastest at residual within 0.2 px of the best,
computed over HEADLINE-workload runs only — BENCH_FRAMES/BENCH_CHUNK
rows are listed but excluded from the pick). Run it over ALL of
docs/measurements/bench_sweep*.log when deciding the shipped default:
a partial grid can understate best_px and let an out-of-budget config
win.
"""

import json
import os
import re
import sys


def parse(path):
    runs, cur = [], None
    for line in open(path, errors="replace"):
        m = re.match(r"^--- (\S.*?) \((.*)\) (\d\d:\d\d:\d\d) ---", line)
        if m:
            cur = {"tag": m.group(1), "env": m.group(2), "fps": None,
                   "s1_ms": None, "s2_ms": None, "px": None, "rc": None,
                   "extra": []}
            runs.append(cur)
            continue
        if cur is None:
            continue
        if line.startswith('{"metric"'):
            # a section can carry several JSON lines (BENCH_SINGLE emits
            # its own single_frame_throughput record on stderr before the
            # headline stdout line) — keep the headline in fps, surface
            # variant records as extra rows
            try:
                rec = json.loads(line)
                if rec.get("metric", "").startswith("solver_throughput"):
                    cur["fps"] = rec["value"]
                else:
                    cur["extra"].append(line.strip())
            except ValueError:
                pass
        m = re.search(r"stage-1 (\d+) ms \+ stage-2 (\d+) ms", line)
        if m:
            cur["s1_ms"], cur["s2_ms"] = int(m.group(1)), int(m.group(2))
        m = re.search(r"residual pixel error ([\d.]+)px", line)
        if m:
            cur["px"] = float(m.group(1))
        if ("frames/s raster" in line or "latency mean" in line
                or "stream-scan" in line and "ms/frame" in line):
            cur["extra"].append(line.strip())
        m = re.match(r"^rc=(\d+) for (.*)", line)
        if m and m.group(2) == cur["tag"]:
            cur["rc"] = int(m.group(1))
    return runs


def main(argv):
    paths = argv if argv else ["/tmp/bench_sweep.log"]
    # chronological merge: argv/glob order is lexicographic (sweep10 sorts
    # before sweep2), so order logs by mtime; within a log, later sections
    # are later runs. A failed duplicate never overrides a successful one.
    paths = sorted(paths, key=lambda p: os.path.getmtime(p) if os.path.exists(p) else 0)
    by_tag = {}
    for path in paths:
        for r in parse(path):
            old = by_tag.get(r["tag"])
            if old is not None:
                if old["rc"] == 0 and r["rc"] != 0:
                    print(f"warning: keeping successful '{r['tag']}' "
                          f"(env {old['env']}); ignoring later FAILED run "
                          f"from {path}", file=sys.stderr)
                    continue
                print(f"warning: '{r['tag']}' overridden by newer run "
                      f"from {path}", file=sys.stderr)
            by_tag[r["tag"]] = r
    runs = list(by_tag.values())
    if not runs:
        print(f"no sweep sections found in {paths}")
        return 1
    ok = [r for r in runs if r["rc"] == 0 and r["fps"] is not None]
    print(f"{'tag':24} {'frames/s':>9} {'s1 ms':>6} {'s2 ms':>6} "
          f"{'px':>6}  env")
    for r in sorted(runs, key=lambda r: -(r["fps"] or 0)):
        fps = f"{r['fps']:.0f}" if r["fps"] is not None else "FAIL"
        print(f"{r['tag']:24} {fps:>9} "
              f"{r['s1_ms'] if r['s1_ms'] is not None else '-':>6} "
              f"{r['s2_ms'] if r['s2_ms'] is not None else '-':>6} "
              f"{r['px'] if r['px'] is not None else '-':>6}  {r['env']}")
        for e in r["extra"]:
            print(f"{'':24} {e}")
    # Recommendation rule: only HEADLINE-workload runs compete — a
    # BENCH_FRAMES=10000 row's fps (10x the work) or a BENCH_CHUNK row
    # (different dispatch structure) is not comparable with the default
    # 1000-frame vmapped workload, and must neither set best_px nor win.
    headline = [r for r in ok
                if "BENCH_FRAMES" not in r["env"]
                and "BENCH_CHUNK" not in r["env"]
                and "BENCH_SINGLE" not in r["env"]
                and "BENCH_RENDER" not in r["env"]
                and r["px"] is not None]
    if headline:
        best_px = min(r["px"] for r in headline)
        good = [r for r in headline if r["px"] <= best_px + 0.2]
        pick = max(good, key=lambda r: r["fps"])
        n_skip = len(ok) - len(headline)
        print(f"\nrecommended default (fastest within 0.2 px of best "
              f"residual {best_px:.2f}, headline workload only"
              + (f"; {n_skip} non-headline run(s) excluded" if n_skip else "")
              + f"): {pick['tag']} "
              f"({pick['fps']:.0f} frames/s @ {pick['px']:.2f} px)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
