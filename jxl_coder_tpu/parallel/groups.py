"""Group-grid sharding of the VarDCT decode over a device mesh.

The TPU-native equivalent of libjxl's resizable thread-pool runner
(SURVEY.md §2.6): groups/block-rows are embarrassingly parallel after the
TOC is parsed; cross-group context (Gaborish + EPF filter footprints) is
exchanged as 1-pixel-per-filter-pass halos via `jax.lax.ppermute` over the
mesh axis — riding ICI, never the host.

Sharding layout: block rows (nY) are partitioned over the mesh axis "g".
Each shard runs the per-block dequant+IDCT (no halo needed), then
exchanges `halo` pixel rows with its neighbors, applies the filters on the
padded slab, and crops.  Output matches the single-device path.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..vardct import pipeline as pl


def make_mesh(n_devices: Optional[int] = None, axis: str = "g") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _exchange_halo(slab: jnp.ndarray, halo: int, axis_name: str):
    """slab: (C, rows, W) shard.  Returns slab padded with `halo` rows of
    real neighbor data on top/bottom (edge-replicated at global edges)."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    # send bottom rows down (they become the next shard's top halo)
    down = [(i, i + 1) for i in range(n - 1)]
    up = [(i + 1, i) for i in range(n - 1)]
    bottom = slab[:, -halo:, :]
    top = slab[:, :halo, :]
    from_above = jax.lax.ppermute(bottom, axis_name, down)
    from_below = jax.lax.ppermute(top, axis_name, up)
    # boundary shards: edge-replicate own rows
    edge_top = jnp.repeat(slab[:, :1, :], halo, axis=1)
    edge_bottom = jnp.repeat(slab[:, -1:, :], halo, axis=1)
    from_above = jnp.where(idx == 0, edge_top, from_above)
    from_below = jnp.where(idx == n - 1, edge_bottom, from_below)
    return jnp.concatenate([from_above, slab, from_below], axis=1)


def sharded_reconstruct(mesh: Mesh, epf_iters: int = 1, gab: bool = True):
    """Build a jitted sharded decode fn over `mesh` (axis "g").

    Inputs must have nY divisible by the mesh size; use pad_to_shardable.
    Returns fn(ac, dc, qf, fx, fb, distance) -> (3, H, W) XYB.
    """
    axis = mesh.axis_names[0]
    halo = pl.filter_halo(epf_iters, gab)

    def per_shard(ac, dc, qf, fx, fb, distance):
        img = pl.dequant_idct(ac, dc, qf, fx, fb, distance)
        if halo == 0:
            return img
        inv_sigma = pl.inv_sigma_map(qf, distance)
        stacked = jnp.concatenate([img, inv_sigma[None]], axis=0)
        padded = _exchange_halo(stacked, halo, axis)
        return pl.apply_filters(padded[:3], padded[3], epf_iters, gab)

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(axis), P(axis), P(axis),
                  P()),
        out_specs=P(None, axis))
    return jax.jit(fn)


def pad_to_shardable(ny: int, n_devices: int) -> int:
    """Block rows padded so each shard gets an equal slab."""
    per = -(-ny // n_devices)
    return per * n_devices


def pad_frame_arrays(ac, dc, qf, fx, fb, n_devices: int):
    """Pad block-row axis to a multiple of n_devices (qf padded with 8 to
    keep inv_sigma finite)."""
    ny = qf.shape[0]
    tot = pad_to_shardable(ny, n_devices)
    e = tot - ny
    if e == 0:
        return ac, dc, qf, fx, fb, ny
    ac = np.pad(ac, ((0, 0), (0, e), (0, 0), (0, 0), (0, 0)))
    dc = np.pad(dc, ((0, 0), (0, e), (0, 0)))
    qf = np.pad(qf, ((0, e), (0, 0)), constant_values=8)
    fx = np.pad(fx, ((0, e), (0, 0)))
    fb = np.pad(fb, ((0, e), (0, 0)))
    return ac, dc, qf, fx, fb, ny


# ---------------------------------------------------------------------------
# Frame-level (GOP) sharding for animation decode

def sharded_frame_reconstruct(mesh: Mesh, epf_iters: int = 1,
                              gab: bool = True):
    """Batch-decode N frames with the frame axis sharded over the mesh —
    the GOP-sharding axis of SURVEY.md §2.6 (animation frames are
    independent for REPLACE blending).

    Returns fn(ac (N,3,nY,nX,8,8), dc (N,3,nY,nX), qf (N,nY,nX),
    fx, fb (N,nY,nX), distance) -> (N, 3, H, W) XYB.
    N must be divisible by the mesh size.
    """
    import jax.numpy as jnp
    axis = mesh.axis_names[0]
    halo = pl.filter_halo(epf_iters, gab)

    def one(ac, dc, qf, fx, fb, distance):
        img = pl.dequant_idct(ac, dc, qf, fx, fb, distance)
        img = pl.pad_rows(img, halo)
        inv = pl.pad_rows(pl.inv_sigma_map(qf, distance), halo)
        return pl.apply_filters(img, inv, epf_iters, gab)

    def per_shard(ac, dc, qf, fx, fb, distance):
        return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, None))(
            ac, dc, qf, fx, fb, distance)

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(axis))
    return jax.jit(fn)
