"""A/B the parity-window down convs on-chip in ONE process.

Builds and times the bench train step with TODA_PARITY_DOWN=0 then =1 (same
process, so every kernel the two variants share hits the remote compile
cache the second time). Prints one JSON line per variant.

Run: python tools/ab_parity.py [batch_size]
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def run(tag, batch_size):
    import jax

    import bench

    step, state, batches, bs = bench.build_bench(batch_size)
    state, tb = step(state, batches[0])
    jax.block_until_ready(tb["loss"])
    iters = 20
    t0 = time.time()
    for i in range(iters):
        state, tb = step(state, batches[i % len(batches)])
    jax.block_until_ready(tb["loss"])
    dt = time.time() - t0
    sps = iters * bs / dt
    print(json.dumps({"variant": tag, "scans_per_sec": round(sps, 2),
                      "loss": float(tb["loss"])}), flush=True)
    return sps


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    order = sys.argv[2] if len(sys.argv) > 2 else "01"
    for ch in order:
        os.environ["TODA_PARITY_DOWN"] = ch
        run(f"parity={ch}", batch_size)


if __name__ == "__main__":
    main()
