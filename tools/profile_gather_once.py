"""Trace ONE span-gather pallas call and dump every device slice.

Run: python tools/profile_gather_once.py [BLOCK] [SPAN]
"""

import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from toda_tpu.ops import pallas_gather as pg

    if len(sys.argv) > 2:
        pg.BLOCK, pg.SPAN = int(sys.argv[1]), int(sys.argv[2])

    BT, P, W = 4, 32768, 768
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(BT, P, W).astype(np.float32), dtype=jnp.bfloat16)
    base = np.arange(P)
    idx = np.sort(np.clip(base + rng.randint(-2, 3, size=P) + 180, 0, P - 1))
    idx = np.where(rng.rand(P) < 0.15, -1, idx).astype(np.int32)
    idx_b = jnp.asarray(np.broadcast_to(idx, (BT, P)).copy())

    f = jax.jit(pg.gather_rows)
    for _ in range(2):
        jax.block_until_ready(f(table, idx_b))

    trace_dir = "/tmp/toda_trace_g1"
    with jax.profiler.trace(trace_dir):
        outs = [f(table, jnp.where(idx_b >= 0, idx_b + k, -1)) for k in range(3)]
        jax.block_until_ready(outs)

    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(files[-1], "rt") as fh:
        trace = json.load(fh)
    pid_names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    agg = defaultdict(lambda: [0.0, 0])
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        a = agg[ev.get("name", "")[:90]]
        a[0] += ev.get("dur", 0) / 1e3
        a[1] += 1
    total = sum(v[0] for v in agg.values())
    print(f"device slices total {total:.2f} ms over 3 calls")
    for name, (ms, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:25]:
        print(f"{ms/3:9.3f} ms/call x{cnt//3:<6d} {name}")


if __name__ == "__main__":
    main()
