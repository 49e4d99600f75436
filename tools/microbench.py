"""Consolidated perf microbenches and probes for the fused pillar-sparse path.

One parameterized driver (VERDICT r3 weak #7: tools/ holds drivers, not
scratch). Every recorded measurement these tools produced lives in NOTES.md;
the superseded exploratory scripts (ladder variants, lane-gather sweeps,
span-hot experiments) were deleted in the same commit — their findings are in
NOTES.md "Late-r3 kernel arc" / "perf arc" sections and git history.

Subcommands:
    trace [steps]        capture a device trace of bench.py steps -> /tmp/toda_trace
    selftime [steps]     nesting-aware self-time breakdown of the newest trace
    layer [M nz c s]     A/B fused BN+ReLU+gather9+conv layer vs legacy pipeline
    gather [M c]         production-shape gather kernel timings (one-hot MXU dot)
    spans [blk]          per-dy-group window span needs vs block size (subm+down)

Run: python tools/microbench.py <subcommand> [args...]
(on-chip unless the subcommand says otherwise; spans runs on CPU:
 PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/microbench.py spans)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# ---------------------------------------------------------------------------
# trace  (from tools/profile_bench.py)
# Profile the bench train step on the real chip and print the top ops.
# ---------------------------------------------------------------------------

import glob
import gzip
import json
from collections import defaultdict



def cmd_trace():
    import jax

    import bench

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    _, step, state, batches, _ = bench.build_bench("second", bs)
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


# ---------------------------------------------------------------------------
# selftime  (from tools/profile_selftime.py)
# Nesting-aware self-time breakdown of an existing bench trace.
# ---------------------------------------------------------------------------

import glob
import gzip
import json
import re
from collections import defaultdict


def cmd_selftime():
    nsteps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    files = sorted(glob.glob("/tmp/toda_trace/**/*.trace.json.gz", recursive=True))
    if not files:
        print("no trace under /tmp/toda_trace — run `python tools/microbench.py trace` first")
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


# ---------------------------------------------------------------------------
# layer  (from tools/microbench_fused_layer.py)
# A/B the fully fused BN+ReLU+gather9+conv layer vs the legacy
# ---------------------------------------------------------------------------

import time
from functools import partial


import numpy as np


def cmd_layer():
    import jax
    import jax.numpy as jnp

    import toda_tpu.ops.pallas_fused_conv as pfc
    from toda_tpu.ops.pillar_sparse import pillar_conv3d_t

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    nz = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    cout = c
    ny = nx = 1024
    rng = np.random.RandomState(0)

    keys = np.sort(rng.choice(ny * nx, size=M, replace=False)).astype(np.int64)
    idx = np.full((M, 9), -1, np.int32)
    for t in range(9):
        dy, dx = divmod(t, 3)
        q = keys + (dy - 1) * nx + (dx - 1)
        j = np.searchsorted(keys, q)
        jc = np.clip(j, 0, M - 1)
        hit = keys[jc] == q
        idx[:, t] = np.where(hit, jc, -1)
    idxj = jnp.asarray(idx)
    invj = idxj[:, ::-1]
    maskf = jnp.ones((M,), bool)

    tableT = jnp.asarray(rng.randn(nz * c, M).astype(np.float32), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(3, 3, 3, c, cout).astype(np.float32) * 0.1,
                     jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(3, 3, 3, cout, cout).astype(np.float32) * 0.1,
                     jnp.bfloat16)
    sc = jnp.asarray(0.9 + 0.1 * rng.rand(cout).astype(np.float32))
    sh = jnp.asarray(0.1 * rng.randn(cout).astype(np.float32))

    def stats(raw, nzz, cc):
        x3 = raw.reshape(nzz, cc, -1).astype(jnp.float32)
        mean = x3.mean(axis=(0, 2))
        var = jnp.maximum((x3 * x3).mean(axis=(0, 2)) - mean**2, 0)
        inv = jax.lax.rsqrt(var + 1e-3)
        return inv, -mean * inv

    def apply_aff(raw, s_, b_, nzz, cc):
        x3 = raw.reshape(nzz, cc, -1)
        y = x3 * s_.astype(raw.dtype)[None, :, None] + b_.astype(raw.dtype)[None, :, None]
        return jnp.maximum(y, 0).reshape(nzz * cc, -1)

    def legacy2(tbl, w1_, w2_):
        r1 = pillar_conv3d_t(tbl, idxj, w1_, maskf, nz, 1, 4, invj)
        s1, b1 = stats(r1, nz, cout)
        a1 = apply_aff(r1, s1, b1, nz, cout)
        r2 = pillar_conv3d_t(a1, idxj, w2_, maskf, nz, 1, 4, invj)
        s2, b2 = stats(r2, nz, cout)
        return apply_aff(r2, s2, b2, nz, cout)

    def fused2(tbl, w1_, w2_):
        r1 = pfc.fused_bnconv9_t(tbl, sc, sh, w1_, idxj, invj, nz, 1, 4, True)
        s1, b1 = stats(r1, nz, cout)
        r2 = pfc.fused_bnconv9_t(r1, s1, b1, w2_, idxj, invj, nz, 1, 4, True)
        s2, b2 = stats(r2, nz, cout)
        return apply_aff(r2, s2, b2, nz, cout)

    def timeit(name, fn, grad=False):
        if grad:
            def loss(tbl, w1_, w2_):
                return fn(tbl, w1_, w2_).astype(jnp.float32).mean()
            g = jax.grad(loss, argnums=(1, 2))

            def call(tbl, s):
                gw1, gw2 = g(tbl, w1 * (1 + s * 1e-6).astype(w1.dtype), w2)
                return gw1[0, 0, 0, 0, 0].astype(jnp.float32)
        else:
            def call(tbl, s):
                out = fn(tbl, w1 * (1 + s * 1e-6).astype(w1.dtype), w2)
                return out[:8, :128].astype(jnp.float32).sum()

        @partial(jax.jit, static_argnames=("n",))
        def loop(tbl, n):
            def body(carry, _):
                s, acc = carry
                # true data dep: the output scalar perturbs the next iter
                v = call(tbl, acc * 1e-9 + s.astype(jnp.float32))
                return (s + 1, acc * 0.5 + v), None
            (_, acc), _ = jax.lax.scan(
                body, (jnp.int32(0), jnp.float32(0)), None, length=n)
            return acc

        n = 16
        jax.block_until_ready(loop(tableT, n=n))  # compile + warm
        t0 = time.perf_counter()
        jax.block_until_ready(loop(tableT, n=n))
        per = (time.perf_counter() - t0) / n * 1000
        print(f"{name}: {per:.2f} ms/call", flush=True)
        return per

    a = timeit("legacy2 fwd     ", legacy2)
    b = timeit("fused2  fwd     ", fused2)
    print(f"fwd speedup: {a / b:.2f}x")
    ag = timeit("legacy2 fwd+bwd ", legacy2, grad=True)
    bg = timeit("fused2  fwd+bwd ", fused2, grad=True)
    print(f"fwd+bwd speedup: {ag / bg:.2f}x")


# ---------------------------------------------------------------------------
# gather  (from tools/microbench_gather_prod.py)
# Hardware check of toda_tpu.ops.pallas_gather at model-realistic shapes:
# ---------------------------------------------------------------------------

import time
from functools import partial


import numpy as np


def cmd_gather():
    import jax
    import jax.numpy as jnp

    from toda_tpu.ops import pallas_gather as pg

    # stage-1 shape at bs4: table (4*32768, 688) bf16, 9 monotone taps
    BT, P, W = 4, 32768, 768  # stage-1 W=(41+2)*16=688 padded to the lane multiple
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(BT, P, W).astype(np.float32), dtype=jnp.bfloat16)
    base = np.arange(P)
    idx = np.sort(np.clip(base + rng.randint(-2, 3, size=P) + 180, 0, P - 1))
    idx = np.where(rng.rand(P) < 0.15, -1, idx).astype(np.int32)
    idx_b = jnp.asarray(np.broadcast_to(idx, (BT, P)).copy())

    # exactness vs fallback
    got = jax.jit(pg.gather_rows)(table, idx_b)
    want = jax.jit(pg._xla_gather)(table.reshape(BT * P, W),
                                   jnp.asarray(np.concatenate(
                                       [np.where(idx >= 0, idx + b * P, -1) for b in range(BT)])))
    err = np.abs(np.asarray(got, np.float32).reshape(BT * P, W) - np.asarray(want, np.float32)).max()
    print(f"fwd exactness vs fallback: max err {err}", flush=True)
    assert err == 0.0, err

    gbar = jnp.asarray(rng.randn(BT, P, W).astype(np.float32), dtype=jnp.bfloat16)
    s_got = jax.jit(partial(pg.scatter_rows_add, n=P))(gbar, idx_b)
    s_want = jax.jit(partial(pg._xla_scatter_add, n=BT * P))(
        gbar.reshape(BT * P, W),
        jnp.asarray(np.concatenate([np.where(idx >= 0, idx + b * P, -1) for b in range(BT)])),
    ).reshape(BT, P, W)
    serr = np.abs(np.asarray(s_got, np.float32) - np.asarray(s_want, np.float32)).max()
    print(f"bwd(scatter) exactness vs fallback: max err {serr}", flush=True)
    assert serr < 0.3, serr  # bf16 fallback accumulates in bf16; kernel in f32

    def mk_bench(gfn):
        @partial(jax.jit, static_argnames=("iters",))
        def bench(table, idx_b, iters):
            def body(c, _):
                g = gfn(table, jnp.where(idx_b >= 0, idx_b + c, -1))
                return ((g[:, :, :64].astype(jnp.float32)
                         * g[::-1, ::-1, :64].astype(jnp.float32)).sum() > 1e19
                        ).astype(jnp.int32), None

            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
            return c

        return bench

    def take_ref(table, idx_b):
        safe = jnp.where(idx_b >= 0, idx_b, P)
        padded = jnp.concatenate([table, jnp.zeros((BT, 1, W), table.dtype)], axis=1)
        return jax.vmap(lambda t, i: jnp.take(t, i, axis=0))(padded, safe)

    nbytes = BT * P * W * 2

    def timeit(name, fn, iters=30):
        jax.block_until_ready(fn(table, idx_b, iters=iters))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(table, idx_b, iters=iters))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1e3:.3f} ms  {nbytes/dt/1e9:.1f} GB/s payload", flush=True)
        return dt

    t_new = timeit("fwd gather_rows ", mk_bench(pg.gather_rows))
    t_old = timeit("fwd take        ", mk_bench(take_ref))
    print(f"fwd speedup: {t_old/t_new:.2f}x", flush=True)

    # fwd+bwd through a scalar loss
    def mk_grad_bench(gfn):
        def loss(table, idx_b):
            g = gfn(table, idx_b)
            return (g.astype(jnp.float32) * g[::-1, ::-1].astype(jnp.float32)).sum()

        vg = jax.grad(loss)

        @partial(jax.jit, static_argnames=("iters",))
        def bench(table, idx_b, iters):
            def body(t, _):
                gr = vg(t, idx_b)
                return t + 1e-9 * gr, None

            t, _ = jax.lax.scan(body, table, None, length=iters)
            return t

        return bench

    t_new = timeit("fwd+bwd gather_rows ", mk_grad_bench(pg.gather_rows), iters=20)
    t_old = timeit("fwd+bwd take        ", mk_grad_bench(take_ref), iters=20)
    print(f"fwd+bwd speedup: {t_old/t_new:.2f}x", flush=True)


# ---------------------------------------------------------------------------
# spans  (from tools/probe_group_spans.py)
# Probe the fused kernel's PER-DY-GROUP window needs vs block size.
# ---------------------------------------------------------------------------

import numpy as np


def group_need(folded, blk, align):
    """folded (M, 9) folded tap table; returns minimal legal span for
    per-dy-group windows with `align`-aligned starts."""
    m = folded.shape[0] - folded.shape[0] % blk
    t = folded[:m].reshape(-1, blk, 9)
    need = 0
    for g in range(3):
        grp = t[:, :, 3 * g : 3 * g + 3].reshape(len(t), -1)
        v = grp >= 0
        any_v = v.any(1)
        lo = np.where(v, grp, 1 << 30).min(1)
        lo = np.where(any_v, (lo // align) * align, 0)
        hi = np.where(v, grp, -1).max(1)
        n = np.where(any_v, hi - lo + 1, 0)
        need = max(need, int(n.max()))
    return need


def cmd_spans():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bench
    from toda_tpu.ops.pillar_sparse import (
        bev_down_tables,
        bev_downsample_sites,
        bev_neighbor_idx_sorted,
        voxelize_pillars,
    )

    _, _, _, arrays, bs = bench.build_bench("second", 4)
    pts = np.concatenate([np.asarray(b["points"]) for b in arrays]) \
        if isinstance(arrays, list) else np.asarray(arrays["points"])
    pmask = np.concatenate([np.asarray(b["points_mask"]) for b in arrays]) \
        if isinstance(arrays, list) else np.asarray(arrays["points_mask"])
    bs = pts.shape[0]
    nx = ny = 1024
    nz = 40
    caps = [32768, 16384, 8192, 4096]

    vox = jax.vmap(
        lambda p, m: voxelize_pillars(
            p, m, (0.1, 0.1, 0.2), (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
            grid_size=(nx, ny, nz), max_pillars=caps[0], nz=nz,
        )
    )(jnp.asarray(pts), jnp.asarray(pmask))
    coords = np.asarray(vox["pillar_coords"])
    mask = np.asarray(vox["pillar_mask"])
    print(f"samples={bs}, active pillars: {mask.sum(1)}")

    blks = [128, 256, 384, 512]
    bev_shape = (ny, nx)
    cur_c, cur_m = coords, mask
    for si in range(4):
        p = cur_c.shape[1]
        nbr = np.stack([
            np.asarray(bev_neighbor_idx_sorted(
                jnp.asarray(cur_c[b]), jnp.asarray(cur_m[b]),
                jnp.asarray(cur_c[b]), jnp.asarray(cur_m[b]), bev_shape, 1))
            for b in range(bs)
        ])
        folded = np.concatenate(
            [np.where(nbr[b] >= 0, nbr[b] + b * p, -1) for b in range(bs)])
        # subm: inverse table = mirrored taps on the same table -> same needs
        for blk in blks:
            n128 = group_need(folded, blk, 128)
            n8 = group_need(folded, blk, 8)
            print(f"stage{si+1} subm blk={blk}: need128={n128} need8={n8}")
        if si == 3:
            break
        p_out = caps[si + 1]
        new_c, new_m, nbrs, invs = [], [], [], []
        coarse_shape = (-(-bev_shape[0] // 2), -(-bev_shape[1] // 2))
        for b in range(bs):
            c2, m2 = bev_downsample_sites(
                jnp.asarray(cur_c[b]), jnp.asarray(cur_m[b]), 2, p_out,
                bev_shape)
            nb, iv = bev_down_tables(
                jnp.asarray(cur_c[b]), jnp.asarray(cur_m[b]), c2, m2,
                bev_shape, coarse_shape)
            new_c.append(np.asarray(c2)); new_m.append(np.asarray(m2))
            nbrs.append(np.asarray(nb)); invs.append(np.asarray(iv))
        foldf = np.concatenate(
            [np.where(nbrs[b] >= 0, nbrs[b] + b * p, -1) for b in range(bs)])
        foldi = np.concatenate(
            [np.where(invs[b] >= 0, invs[b] + b * p_out, -1) for b in range(bs)])
        for blk in blks:
            nf128 = group_need(foldf, blk, 128)
            nf8 = group_need(foldf, blk, 8)
            ni128 = group_need(foldi, blk, 128)
            ni8 = group_need(foldi, blk, 8)
            print(f"  down{si+2} blk={blk}: fwd need128={nf128} need8={nf8} | "
                  f"bwd need128={ni128} need8={ni8}")
        cur_c, cur_m = np.stack(new_c), np.stack(new_m)
        bev_shape = coarse_shape

    print("done")



COMMANDS = {
    "trace": cmd_trace,
    "selftime": cmd_selftime,
    "layer": cmd_layer,
    "gather": cmd_gather,
    "spans": cmd_spans,
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in COMMANDS:
        print(__doc__)
        raise SystemExit(1)
    cmd = sys.argv.pop(1)  # subcommand args shift into sys.argv[1:]
    COMMANDS[cmd]()


if __name__ == "__main__":
    main()
