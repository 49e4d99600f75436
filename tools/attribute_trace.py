"""Join trace self-times with HLO op_name metadata.

Prints every non-pallas slice >= threshold ms/step with its python-source
attribution (op_name + source line) from the dumped optimized HLO.

Run: python tools/attribute_trace.py [n_steps] [min_ms] [hlo_path]
"""

import glob
import gzip
import json
import re
import sys
from collections import defaultdict


def main():
    nsteps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    min_ms = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
    hlo_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/step_hlo.txt"

    files = sorted(glob.glob("/tmp/toda_trace/**/*.trace.json.gz", recursive=True))
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
        by_track[(ev["pid"], ev.get("tid", 0))].append(
            (ev["ts"], ev["ts"] + ev.get("dur", 0), ev.get("name", ""))
        )
    key = max(by_track, key=lambda k: len(by_track[k]))
    slices = sorted(by_track[key], key=lambda s: (s[0], -(s[1] - s[0])))

    self_ms = defaultdict(float)
    stack = []
    child_time = []
    for ts, te, name in slices:
        while stack and ts >= stack[-1][0]:
            end, nm, idx = stack.pop()
            self_t = child_time[idx][1] - child_time[idx][0]
            self_ms[nm] += self_t
            if stack:
                child_time[stack[-1][2]][0] += child_time[idx][1]
        child_time.append([0.0, (te - ts) / 1e3])
        stack.append((te, name, len(child_time) - 1))
    while stack:
        end, nm, idx = stack.pop()
        self_ms[nm] += child_time[idx][1] - child_time[idx][0]
        if stack:
            child_time[stack[-1][2]][0] += child_time[idx][1]

    # HLO metadata index: instruction name -> (shape, op_name, source)
    meta = {}
    pat = re.compile(
        r"%([a-zA-Z0-9_.-]+) = ([a-z0-9]+\[[0-9,]*\])[^\n]*?"
        r'(?:metadata=\{op_name="([^"]*)"'
        r'(?: source_file="([^"]*)" source_line=(\d+))?)?'
    )
    with open(hlo_path) as f:
        for line in f:
            m = pat.search(line)
            if m and m.group(1) not in meta:
                meta[m.group(1)] = (m.group(2), m.group(3) or "", m.group(4), m.group(5))

    rows = []
    for nm, ms in self_ms.items():
        per = ms / nsteps
        if per < min_ms:
            continue
        if re.sub(r"[.\d]+$", "", nm).startswith(("cond", "branch")):
            continue
        shape, op, sf, sl = meta.get(nm, ("?", "", None, None))
        # shorten op_name: keep the last 3 path segments
        op_short = "/".join(op.split("/")[-3:]) if op else ""
        src = f"{sf.split('/')[-1]}:{sl}" if sf else ""
        rows.append((per, nm, shape, op_short, src))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"non-pallas slices >= {min_ms} ms/step: total {total:.1f} ms/step")
    for per, nm, shape, op, src in rows:
        print(f"{per:7.2f}  {nm:<28} {shape:<22} {src:<26} {op[:90]}")


if __name__ == "__main__":
    main()
