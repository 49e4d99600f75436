"""Profile the bench train step on the real chip and print the top ops.

Captures a jax.profiler trace of a few steps, then parses the perfetto
trace.json.gz for XLA op slices and aggregates duration by op name.

Run: python tools/profile_bench.py [batch_size]
"""

import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax

    import bench

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    step, state, batches, _ = bench.build_bench(bs)
    state, tb = step(state, batches[0])
    jax.block_until_ready(tb["loss"])

    trace_dir = "/tmp/toda_trace"
    with jax.profiler.trace(trace_dir):
        for i in range(3):
            state, tb = step(state, batches[i % len(batches)])
        jax.block_until_ready(tb["loss"])

    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    if not files:
        print("no trace files found under", trace_dir)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)

    # device-track slices only: find TensorCore pids
    pid_names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}

    # group by (pid, tid) and report the busiest *op-level* track (the one
    # with the most slices) to avoid double counting nested module slices
    tracks = defaultdict(lambda: defaultdict(float))
    counts = defaultdict(int)
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        key = (ev["pid"], ev.get("tid", 0))
        tracks[key][ev.get("name", "")] += ev.get("dur", 0) / 1e3
        counts[key] += 1
    if not tracks:
        print("no device slices found")
        return
    key = max(counts, key=lambda k: counts[k])
    agg = tracks[key]
    total = sum(agg.values())
    print(f"pids: { {p: pid_names[p] for p in dev_pids} }; op track {key} "
          f"({counts[key]} slices)")
    print(f"total device op time over 3 steps: {total:.1f} ms -> {total/3:.1f} ms/step")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{ms/3:9.2f} ms/step  {100*ms/max(total,1e-9):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
