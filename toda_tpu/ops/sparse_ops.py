"""Sparse-conv building blocks: on-device rulebook construction.

TPU-native replacement for the external spconv library's SubMConv3d /
SparseConv3d (reference usage: pcdet/models/backbones_3d/spconv_backbone.py).
CUDA spconv builds rulebooks with hash tables + stream compaction — dynamic
shapes everywhere. Here the active set is a static-capacity padded list
(V, C) + (V, 3) zyx coords + (V,) mask, and neighbor lookup goes through a
*dense int32 coord->slot map* per stride level:

    coord_map: (nz, ny, nx) int32, -1 empty          (one gather per neighbor)

The map costs nz*ny*nx * 4 bytes (e.g. 41x1600x1408 @ 0.075 m -> ~370 MB at
stride 1 — affordable in HBM, shrinking 8x per stride) and turns rulebook
construction into pure scatter/gather with zero host sync.

Convolution itself is gather -> one (V, K*Cin) x (K*Cin, Cout) GEMM -> done:
a single large MXU matmul per layer instead of spconv's per-offset scatter-GEMMs.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def kernel_offsets(kernel_size=3):
    """Static (K, 3) zyx offsets, centered (kernel_size odd)."""
    r = kernel_size // 2
    offs = [
        (dz, dy, dx)
        for dz in range(-r, r + 1)
        for dy in range(-r, r + 1)
        for dx in range(-r, r + 1)
    ]
    return np.asarray(offs, dtype=np.int32)  # (K, 3)


@partial(jax.jit, static_argnames=("grid_size",))
def build_coord_map(coords, mask, grid_size):
    """coords (V, 3) zyx, mask (V,) -> dense (nz, ny, nx) int32 slot map (-1 empty)."""
    nz, ny, nx = grid_size
    flat = (coords[:, 0] * ny + coords[:, 1]) * nx + coords[:, 2]
    flat = jnp.where(mask & (coords[:, 0] >= 0), flat, nz * ny * nx)
    v = coords.shape[0]
    idx = jnp.arange(v, dtype=jnp.int32)
    cmap = jnp.full((nz * ny * nx,), -1, dtype=jnp.int32).at[flat].set(idx, mode="drop")
    return cmap.reshape(nz, ny, nx)


@partial(jax.jit, static_argnames=("grid_size", "kernel_size", "stride"))
def gather_neighbor_idx(out_coords, out_mask, coord_map, grid_size, kernel_size=3, stride=1):
    """For each output site, the input slot index of each kernel tap (-1 if empty).

    out_coords are in *output-stride* units; input coords = out*stride + off
    (SAME padding: off centered). Returns (V_out, K) int32.
    """
    nz, ny, nx = grid_size
    offs = jnp.asarray(kernel_offsets(kernel_size))  # (K, 3)
    base = out_coords[:, None, :] * stride + (stride - 1) // 2  # center of coarse cell
    nb = base + offs[None, :, :]  # (V, K, 3)
    in_bounds = (
        (nb[..., 0] >= 0) & (nb[..., 0] < nz)
        & (nb[..., 1] >= 0) & (nb[..., 1] < ny)
        & (nb[..., 2] >= 0) & (nb[..., 2] < nx)
    )
    flat = (nb[..., 0] * ny + nb[..., 1]) * nx + nb[..., 2]
    flat = jnp.where(in_bounds & out_mask[:, None], flat, 0)
    idx = coord_map.reshape(-1)[flat]
    return jnp.where(in_bounds & out_mask[:, None], idx, -1)


def sparse_gather_conv(features, neighbor_idx, weights):
    """features (V_in, Cin), neighbor_idx (V_out, K), weights (K, Cin, Cout).

    One fused GEMM: gathered (V_out, K*Cin) @ W (K*Cin, Cout).
    Missing neighbors (idx -1) contribute zero.
    """
    v_out, k = neighbor_idx.shape
    cin = features.shape[1]
    safe = jnp.clip(neighbor_idx, 0, None)
    g = features[safe]  # (V_out, K, Cin)
    g = jnp.where((neighbor_idx >= 0)[..., None], g, 0.0)
    g = g.reshape(v_out, k * cin)
    w = weights.reshape(k * cin, -1)
    return jnp.dot(g, w, preferred_element_type=jnp.float32).astype(features.dtype)


@partial(jax.jit, static_argnames=("stride", "max_out", "grid_size"))
def sparse_downsample_sites(coords, mask, stride, max_out, grid_size):
    """Active output sites of a strided sparse conv: the occupied coarse cells.

    NOTE deviation from CUDA spconv: spconv's SparseConv3d also activates
    boundary sites whose kernel merely overlaps an input (dilation); we define
    the output active set as exactly the occupied stride-cells. No checkpoint
    compatibility is owed, boundary halo sites carry only partial-kernel
    responses, and the detection metrics see the dense BEV map after stride 8
    where the difference is confined to empty-cell borders.

    Returns (out_coords (max_out, 3), out_mask (max_out,)).
    """
    nz, ny, nx = grid_size
    oz, oy, ox = (nz + stride - 1) // stride, (ny + stride - 1) // stride, (nx + stride - 1) // stride
    coarse = jnp.where(mask[:, None], coords // stride, -1)
    key = (coarse[:, 0] * oy + coarse[:, 1]) * ox + coarse[:, 2]
    key = jnp.where(mask, key, jnp.iinfo(jnp.int32).max)
    skey = jnp.sort(key)
    prev = jnp.concatenate([jnp.array([-1], dtype=skey.dtype), skey[:-1]])
    head = (skey != prev) & (skey != jnp.iinfo(jnp.int32).max)
    out_idx = jnp.cumsum(head.astype(jnp.int32)) - 1
    rows = jnp.where(head & (out_idx < max_out), out_idx, max_out)
    uniq_keys = jnp.full((max_out,), -1, dtype=jnp.int32).at[rows].set(skey, mode="drop")
    out_mask = uniq_keys >= 0
    safe_keys = jnp.where(out_mask, uniq_keys, 0)
    z = safe_keys // (oy * ox)
    y = (safe_keys // ox) % oy
    x = safe_keys % ox
    out_coords = jnp.where(
        out_mask[:, None], jnp.stack([z, y, x], axis=-1), -1
    ).astype(jnp.int32)
    return out_coords, out_mask


@partial(jax.jit, static_argnames=("grid_size",))
def scatter_to_dense(features, coords, mask, grid_size):
    """(V, C) sparse -> (nz, ny, nx, C) dense (zero background)."""
    nz, ny, nx = grid_size
    flat = (coords[:, 0] * ny + coords[:, 1]) * nx + coords[:, 2]
    flat = jnp.where(mask & (coords[:, 0] >= 0), flat, nz * ny * nx)
    c = features.shape[-1]
    dense = jnp.zeros((nz * ny * nx, c), dtype=features.dtype).at[flat].set(
        features, mode="drop"
    )
    return dense.reshape(nz, ny, nx, c)
