"""Follow-up: is TPU take() speed data-dependent on index locality?

microbench_gather showed A (random idx) = 32 ms and B (monotone idx) =
0.002 ms through the SAME jitted executable — implying the gather engine
coalesces local reads. If true, the model's 190 ms of gather time may be
self-inflicted: pillar_conv3d maps missing neighbors to a sentinel row at
the END of the table (p_in), turning a monotone index stream into one that
ping-pongs across all of HBM. This measures:

  B0  monotone, no sentinels             (repeat of B)
  B1  monotone, 20% sentinels -> P (far)  (the current model pattern)
  B2  monotone, 20% sentinels -> nearest valid (clamped, needs masking)
  B3  monotone, 50% sentinels -> far
  B4  monotone, 50% sentinels -> clamped
  A0  random                              (repeat of A)
plus a correctness check that the timed function really computes the gather.
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    P = 32768
    W = 768
    rng = np.random.RandomState(0)
    flat = jnp.asarray(rng.randn(P + 1, W).astype(np.float32))

    base = np.arange(P)
    nbr = np.sort(np.clip(base + rng.randint(-2, 3, size=P) + 180, 0, P - 1)).astype(np.int32)

    def with_sentinels(idx, frac, mode):
        miss = rng.rand(P) < frac
        out = idx.copy()
        if mode == "far":
            out[miss] = P  # the extra zero row at the end (current model behavior)
        else:  # clamped: keep locality, mask later
            out[miss] = idx[miss]
        return out.astype(np.int32), miss

    @partial(jax.jit, static_argnames=("iters",))
    def bench(flat, idx, iters):
        def body(c, _):
            g = jnp.take(flat, idx + c, axis=0)
            return ((g * g[::-1]).sum() > 1e19).astype(jnp.int32), None

        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return c

    # correctness probe: same computation at iters=1 must match numpy
    g = jnp.take(flat, jnp.asarray(nbr), axis=0)
    ref = np.asarray(flat)[nbr]
    assert np.allclose(np.asarray(g), ref), "gather wrong!"
    print("correctness ok", flush=True)

    def timed(name, idx, iters=50):
        idx = jnp.asarray(idx)
        jax.block_until_ready(bench(flat, idx, iters=2))
        t0 = time.perf_counter()
        jax.block_until_ready(bench(flat, idx, iters=iters))
        dt = (time.perf_counter() - t0) / iters
        gbps = P * W * 4 / dt / 1e9
        print(f"{name}: {dt*1e3:.3f} ms  {gbps:.1f} GB/s", flush=True)

    timed("B0_monotone", nbr)
    for frac in (0.2, 0.5):
        far, _ = with_sentinels(nbr, frac, "far")
        cl, _ = with_sentinels(nbr, frac, "clamp")
        timed(f"B_far_{int(frac*100)}", far)
        timed(f"B_clamp_{int(frac*100)}", cl)
    timed("A_random", rng.randint(0, P, size=P).astype(np.int32))
    # sorted random: monotone but with big jumps (locality of slope ~1 vs sorted)
    timed("A_sortedrandom", np.sort(rng.randint(0, P, size=P)).astype(np.int32))


if __name__ == "__main__":
    main()
