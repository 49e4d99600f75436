"""Parse a jax.profiler perfetto trace and print per-op SELF time (flame-style:
parent time minus nested children), aggregated by name.

Usage: python tools/analyze_trace.py [trace_dir] [nsteps]
"""

import glob
import gzip
import json
import sys
from collections import defaultdict


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/toda_trace"
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    pid_names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}

    by_track = defaultdict(list)
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        by_track[(ev["pid"], ev.get("tid", 0))].append(ev)

    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0

    def finalize(entry):
        nonlocal total
        _, name, dur, child = entry
        self_t = max(dur - child, 0) / 1e3
        agg[name] += self_t
        cnt[name] += 1
        total += self_t

    for track, evs in by_track.items():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # [end_ts, name, dur, child_time]
        for ev in evs:
            ts, dur = ev["ts"], ev.get("dur", 0)
            while stack and stack[-1][0] <= ts:
                finalize(stack.pop())
            if stack:
                stack[-1][3] += dur  # full child dur counts against parent
            stack.append([ts + dur, ev.get("name", ""), dur, 0])
        while stack:
            finalize(stack.pop())

    print(f"total device SELF time: {total:.1f} ms -> {total/nsteps:.1f} ms/step")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{ms/nsteps:9.2f} ms/step x{cnt[name]//nsteps:<5d} {name[:100]}")


if __name__ == "__main__":
    main()
