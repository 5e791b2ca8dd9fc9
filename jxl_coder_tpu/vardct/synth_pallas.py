"""Fused VarDCT synthesis as a Pallas TPU kernel.

The jnp synthesis path materializes ~4 full-size f32 intermediates per
family (bias, dequant, CfL stack, LLF set) before the inverse-transform
matmul — on a ~100 GB/s-effective chip that staging alone costs more
than the matmul (research/stage_ablation_r5.py: 3.1 ms of the 5.3 ms
DCT16X16 family at 4K).  This kernel streams the int8 coefficient rows
through VMEM once:

  HBM i8 (n, 3K) -> [bias -> tab*qm scale -> CfL mix -> inv_qac] in
  VMEM -> MXU dot with the (LLF-rows-zeroed) block-diagonal inverse
  basis -> + LLF contribution (second small dot) -> HBM f32 (n, T*192)

Semantics mirror tpu_full._synth_family's non-special branch exactly
(same formulas; float association differs by one multiply — the device
contract's <=1 u8 tolerance absorbs it).  Reference: the SIMD synthesis
loops inside libjxl's dec_xyb/dec_transforms that the wrapper ships
prebuilt (SURVEY.md L1).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import synthesis as S

NUM = np.float32(S.QUANT_BIAS_NUM)

# scal-array column layout (one (n, 128) f32 row per varblock)
COL_INV_QAC = 0
COL_XF = 1
COL_BF = 2
COL_LLF0 = 16          # 3*cy*cx LLF values from column 16 on


def _kernel(cmat_ref, scal_ref, qbtab_ref, rhi_ref, rlo_ref,
            bigl_ref, out_ref, *, K: int, T: int):
    v = cmat_ref[:].astype(jnp.float32)            # (bn, 3K)
    qb = qbtab_ref[0, :]                           # (3K,)
    tabqm = qbtab_ref[1, :]                        # (3K,) = tab*qm
    safe = jnp.where(v == 0.0, jnp.float32(1.0), v)
    bias = jnp.where(jnp.abs(v) > 1.0, v - NUM / safe, v * qb[None, :])
    w = bias * tabqm[None, :]
    uy = w[:, K:2 * K]                             # biasY * tabY
    xf = scal_ref[:, COL_XF][:, None]
    bf = scal_ref[:, COL_BF][:, None]
    iq = scal_ref[:, COL_INV_QAC][:, None]
    dn = (((1,), (0,)), ((), ()))
    T64 = T * 64
    accs = []
    # per-channel dots against the SHARED inverse basis (the basis is
    # channel-independent; the tab*qm scales are already in w) — 1/3
    # the MXU FLOPs of the block-diagonal form, with the channel
    # interleave done in VMEM below instead of an XLA transpose.
    # bf16x3 split (Mosaic lacks Precision.HIGH).
    for c, cm in ((0, w[:, :K] + xf * uy), (1, uy),
                  (2, w[:, 2 * K:] + bf * uy)):
        cm = cm * iq
        hi = cm.astype(jnp.bfloat16)
        lo = (cm - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            hi, rhi_ref[:], dn, preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(
            hi, rlo_ref[:], dn, preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(
            lo, rhi_ref[:], dn, preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot_general(
            scal_ref[:], bigl_ref[:, c * T64:(c + 1) * T64], dn,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        accs.append(acc)                           # (bn, T*64)
    parts = []
    for t in range(T):
        for c in range(3):
            parts.append(accs[c][:, t * 64:(t + 1) * 64])
    out_ref[:] = jnp.concatenate(parts, axis=1)


@functools.lru_cache(maxsize=None)
def _static_mats(bh: int, bw: int):
    """(llf_rows, R_hi, R_lo, BigL) for the family geometry.  R is the
    channel-independent inverse basis (tile-ordered columns) with LLF
    rows zeroed, split into the bf16 hi/lo pair the kernel's 3-pass
    matmul consumes; the tab*qm column scale lives in the kernel
    (qbtab row 1).  BigL rows COL_LLF0+c*ncl.. carry the LLF basis
    rows per channel block (matching the scal layout)."""
    from .tpu_full import _inv_matrix
    R = _inv_matrix(bh, bw)                        # (K, T*64) tile cols
    K = bh * bw
    T = K // 64
    cy, cx = bh // 8, bw // 8
    llf_rows = [ky * bw + kx for ky in range(cy) for kx in range(cx)]
    Rl = R.copy()
    Rl[llf_rows] = 0.0
    r_hi = Rl.astype(jnp.bfloat16)
    r_lo = (Rl - np.asarray(r_hi, np.float32)).astype(jnp.bfloat16)
    ncl = len(llf_rows)
    bigl = np.zeros((128, 3 * T * 64), np.float32)
    for c in range(3):
        for j, r in enumerate(llf_rows):
            bigl[COL_LLF0 + c * ncl + j,
                 c * T * 64:(c + 1) * T * 64] = R[r]
    return llf_rows, r_hi, r_lo, bigl


def synth_supported(fam, n_pad: int, bh: int, bw: int) -> bool:
    """Opt-in (JXL_TPU_SYNTH_PALLAS=1).  Pinned round-5 result: on the
    current vm backend this kernel measures ~8% SLOWER than the jnp
    path for the dominant DCT16X16 family (2.93 vs 2.71 ms/frame at
    4K, KREP=64 latency-diluted) — the jnp path is already at the
    chip's memory wall (~60-95 GB/s effective; research notes in
    PROGRESS.md r5).  Kept for future backends where the single-pass
    VMEM staging should win; numerics verified (rel err ~1e-5 vs the
    jnp path on 3 families)."""
    import os
    K = bh * bw
    T = K // 64
    return (os.environ.get("JXL_TPU_SYNTH_PALLAS", "0") != "0"
            and "fix_idx" not in fam and n_pad >= 32 and T >= 2
            and K <= 512)


def synth_family_pallas(dc_glob, fam, n_pad: int, bh: int, bw: int, qm):
    """Drop-in for the _synth_family non-special branch (returns
    (n_pad*T, 192) flat tile rows)."""
    K = bh * bw
    T = K // 64
    cy, cx = bh // 8, bw // 8
    llf_rows, r_hi_np, r_lo_np, bigl_np = _static_mats(bh, bw)
    ncl = len(llf_rows)
    r_hi = jnp.asarray(r_hi_np)
    r_lo = jnp.asarray(r_lo_np)
    bigl = jnp.asarray(bigl_np)

    # qb / tab*qm per flat column
    qb = np.asarray([1.0 - b for b in S.QUANT_BIAS], np.float32)
    qb_col = jnp.concatenate([jnp.full((K,), qb[c]) for c in range(3)])
    tab = fam["tab"]                               # (3, K) f32
    tabqm = (tab * qm[:, None]).reshape(3 * K)
    qbtab = jnp.zeros((8, 3 * K), jnp.float32)
    qbtab = qbtab.at[0].set(qb_col).at[1].set(tabqm)

    # ---- per-block scalar rows ----
    bys, bxs = fam["bys"], fam["bxs"]
    gy = jnp.clip(bys, 0, dc_glob.shape[1] - 1)
    gx = jnp.clip(bxs, 0, dc_glob.shape[2] - 1)
    dyi = jnp.arange(cy)
    dxi = jnp.arange(cx)
    giy = jnp.clip(gy[:, None, None] + dyi[None, :, None],
                   0, dc_glob.shape[1] - 1)
    gix = jnp.clip(gx[:, None, None] + dxi[None, None, :],
                   0, dc_glob.shape[2] - 1)
    dcb = dc_glob.at[:, giy, gix].get(
        mode="promise_in_bounds")                  # (3, n, cy, cx)
    anY = jnp.asarray(S.ana_basis(cy).astype(np.float32))
    anX = jnp.asarray(S.ana_basis(cx).astype(np.float32))
    rs = jnp.asarray(np.outer(S.resample_vec(cy),
                              S.resample_vec(cx)).astype(np.float32))
    llf = jnp.einsum("ky,cnyx,lx->cnkl", anY, dcb, anX,
                     precision=jax.lax.Precision.HIGHEST) * rs
    llf = llf.reshape(3, n_pad, ncl)               # (3, n, cy*cx)

    scal = jnp.zeros((n_pad, 128), jnp.float32)
    scal = scal.at[:, COL_INV_QAC].set(fam["inv_qac"])
    scal = scal.at[:, COL_XF].set(fam["xf"])
    scal = scal.at[:, COL_BF].set(fam["bf"])
    for c in range(3):
        scal = scal.at[:, COL_LLF0 + c * ncl:
                       COL_LLF0 + (c + 1) * ncl].set(llf[c])

    cmat = fam["cmat"].reshape(n_pad, 3 * K)       # i8, contiguous view
    bn = min(256, n_pad)
    grid = (n_pad // bn,)
    out = pl.pallas_call(
        functools.partial(_kernel, K=K, T=T),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, 3 * K), lambda i: (i, 0)),
            pl.BlockSpec((bn, 128), lambda i: (i, 0)),
            pl.BlockSpec((8, 3 * K), lambda i: (0, 0)),
            pl.BlockSpec((K, T * 64), lambda i: (0, 0)),
            pl.BlockSpec((K, T * 64), lambda i: (0, 0)),
            pl.BlockSpec((128, 3 * T * 64), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bn, T * 192), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, T * 192), jnp.float32),
    )(cmat, scal, qbtab, r_hi, r_lo, bigl)
    return out.reshape(n_pad * T, 192)
