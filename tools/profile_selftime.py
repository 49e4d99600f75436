"""Nesting-aware self-time breakdown of an existing bench trace.

Parses the newest /tmp/toda_trace perfetto trace (produced by
tools/profile_bench.py), subtracts child slice time from parents on the
op-level device track, and aggregates self time by op-name class. Also
prints the top individual self-time slices so kernel-level hotspots
(cond-wrapped pallas calls etc.) are attributable.

Run: python tools/profile_selftime.py [n_steps]
"""

import glob
import gzip
import json
import re
import sys
from collections import defaultdict


def main():
    nsteps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    files = sorted(glob.glob("/tmp/toda_trace/**/*.trace.json.gz", recursive=True))
    if not files:
        print("no trace under /tmp/toda_trace — run tools/profile_bench.py first")
        return
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
        key = (ev["pid"], ev.get("tid", 0))
        by_track[key].append((ev["ts"], ev["ts"] + ev.get("dur", 0), ev.get("name", "")))
    if not by_track:
        print("no device slices")
        return
    key = max(by_track, key=lambda k: len(by_track[k]))
    slices = sorted(by_track[key], key=lambda s: (s[0], -(s[1] - s[0])))

    # stack-based nesting: self time = dur - sum(child durs)
    self_ms = defaultdict(float)
    per_slice = defaultdict(float)
    stack = []  # (end, name, child_time_accum index)
    child_time = []
    for ts, te, name in slices:
        while stack and ts >= stack[-1][0]:
            end, nm, idx = stack.pop()
            dur = child_time[idx][1]
            self_t = dur - child_time[idx][0]
            self_ms[classify(nm)] += self_t
            per_slice[nm] += self_t
            if stack:
                child_time[stack[-1][2]][0] += dur
        child_time.append([0.0, (te - ts) / 1e3])
        stack.append((te, name, len(child_time) - 1))
    while stack:
        end, nm, idx = stack.pop()
        dur = child_time[idx][1]
        self_t = dur - child_time[idx][0]
        self_ms[classify(nm)] += self_t
        per_slice[nm] += self_t
        if stack:
            child_time[stack[-1][2]][0] += dur

    total = sum(self_ms.values())
    print(f"track {key}: {len(slices)} slices, "
          f"self-time total {total:.1f} ms -> {total/nsteps:.1f} ms/step")
    for cls, ms in sorted(self_ms.items(), key=lambda kv: -kv[1]):
        print(f"{ms/nsteps:9.2f} ms/step  {100*ms/total:5.1f}%  {cls}")
    print("\ntop slices by self time:")
    for name, ms in sorted(per_slice.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{ms/nsteps:9.2f} ms/step  {name[:110]}")


def classify(name):
    base = re.sub(r"[.\d]+$", "", name)
    if base.startswith(("cond", "branch")):
        return "pallas+cond (fused/gather kernels)"
    if base.startswith("fusion"):
        return "fusion (elementwise/reduce/scatter)"
    if base.startswith(("convolution", "conv")):
        return "conv"
    if base.startswith("sort"):
        return "sort"
    if base.startswith(("copy", "reshape", "transpose", "bitcast", "slice",
                        "concatenate", "pad", "dynamic")):
        return "data formatting"
    if base.startswith(("all-reduce", "reduce-scatter", "all-gather")):
        return "collectives"
    if base.startswith(("dot", "custom-call")):
        return base
    return "other"


if __name__ == "__main__":
    main()
