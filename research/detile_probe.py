"""Microbench: frame-assembly (detiling) variants for tpu_full.

Times isolated variants of the assembly stage on the real chip with
synthetic data of the true 4K shape.  K iterations run inside one
jitted lax.scan (single dispatch; the axon tunnel's per-dispatch
latency is ~30 ms) with an input perturbation per step to defeat CSE;
completion forced via a checksum fetch.
"""

import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jxl_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

NY, NX = 270, 480
H, W = NY * 8, NX * 8
NSRC = 140000
K = 16


def scan_time(fn, src, perm, reps=3):
    """fn(src, perm) -> array; returns best per-iter seconds over K."""

    @jax.jit
    def run(s, p):
        def body(carry, i):
            r = fn(s + i.astype(jnp.float32) * 1e-7, p)
            return carry + r.reshape(-1)[::100001].astype(jnp.float32).sum(), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return tot

    _ = float(run(src, perm))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(run(src, perm))
        best = min(best, (time.perf_counter() - t0) / K)
    return best


# ---------------------------------------------------------------- v0
def v0(src, perm):
    g = jnp.take(src, perm, axis=0)
    g = g.reshape(NY, NX, 3, 8, 8)
    return g.transpose(2, 0, 3, 1, 4).reshape(3, H, W)


# ---------------------------------------------------------------- v1
def v1(src, perm):
    g = jnp.take(src, perm, axis=0).reshape(NY, NX, 3, 8, 8)
    rows = [g[:, :, c, py, :] for c in range(3) for py in range(8)]
    st = jnp.stack(rows, axis=0).reshape(3, 8, NY, NX * 8)
    return st.transpose(0, 2, 1, 3).reshape(3, H, W)


# ---------------------------------------------------------------- v2
def _detile_dma_kernel(g_hbm, out_hbm, sems):
    i = pl.program_id(0)
    ops = []
    for c in range(3):
        for py in range(8):
            ops.append(pltpu.make_async_copy(
                g_hbm.at[i, :, c, py, :],
                out_hbm.at[c, i * 8 + py],
                sems.at[c * 8 + py]))
    for op in ops:
        op.start()
    for op in ops:
        op.wait()


def v2(src, perm):
    g = jnp.take(src, perm, axis=0).reshape(NY, NX, 3, 8, 8)
    out = pl.pallas_call(
        _detile_dma_kernel,
        out_shape=jax.ShapeDtypeStruct((3, H, NX, 8), jnp.float32),
        grid=(NY,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((24,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(g)
    return out.reshape(3, H, W)


# ---------------------------------------------------------------- v5
NG = NX // 16
_M = np.zeros((16, 8, 128), np.float32)
for _i in range(16):
    for _p in range(8):
        _M[_i, _p, _i * 8 + _p] = 1.0


def v5(src, perm):
    g = jnp.take(src, perm, axis=0).reshape(NY, NG, 16, 3, 8, 8)
    out = jnp.einsum("tgicyp,ipj->ctygj", g, jnp.asarray(_M),
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(3, H, W)


# ------------------------------------------------------------ pieces
def gather_only(src, perm):
    return jnp.take(src, perm, axis=0)


def transpose_only(src, perm):
    g = jax.lax.dynamic_slice(src, (0, 0), (NY * NX, 192))
    g = g.reshape(NY, NX, 3, 8, 8)
    return g.transpose(2, 0, 3, 1, 4).reshape(3, H, W)


def copythrough(src, perm):
    return src * 1.000001


def main():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((NSRC, 192)).astype(np.float32))
    perm = jnp.asarray(rng.permutation(NSRC)[:NY * NX].astype(np.int32))

    ref = np.asarray(jax.jit(v0)(src, perm))
    cases = [("v1", v1), ("v5", v5)]
    if os.environ.get("TRY_DMA", "1") != "0":
        cases.append(("v2", v2))
    good = []
    for name, fn in cases:
        try:
            got = np.asarray(jax.jit(fn)(src, perm))
            ok = np.array_equal(got, ref)
            print(f"{name} correct: {ok}", flush=True)
            if ok:
                good.append((name, fn))
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    for name, fn in ([("copythrough", copythrough),
                      ("gather_only", gather_only),
                      ("transpose_only", transpose_only),
                      ("v0", v0)] + good):
        try:
            t = scan_time(fn, src, perm)
            print(f"{name}: {t * 1e3:.3f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)




# ---------------------------------------------------------- variants2
def v1_half(src16, perm):
    g = jnp.take(src16, perm, axis=0).reshape(NY, NX, 3, 8, 8)
    rows = [g[:, :, c, py, :] for c in range(3) for py in range(8)]
    st = jnp.stack(rows, axis=0).reshape(3, 8, NY, NX * 8)
    return st.transpose(0, 2, 1, 3).reshape(3, H, W).astype(jnp.float32)


def v1_c64(src, perm):
    src64 = src.reshape(NSRC, 3, 64)
    outs = []
    for c in range(3):
        g = jnp.take(src64[:, c], perm, axis=0).reshape(NY, NX, 8, 8)
        rows = [g[:, :, py, :] for py in range(8)]
        st = jnp.stack(rows, axis=0).reshape(8, NY, NX * 8)
        outs.append(st.transpose(1, 0, 2).reshape(H, W))
    return jnp.stack(outs)


def gather_only_half(src16, perm):
    return jnp.take(src16, perm, axis=0)


def main2():
    rng = np.random.default_rng(0)
    srcf = rng.standard_normal((NSRC, 192)).astype(np.float32)
    src = jnp.asarray(srcf)
    src16 = jnp.asarray(srcf.astype(np.float16))
    perm = jnp.asarray(rng.permutation(NSRC)[:NY * NX].astype(np.int32))
    ref = np.asarray(jax.jit(v0)(src, perm))
    got = np.asarray(jax.jit(v1_c64)(src, perm))
    print("v1_c64 correct:", np.array_equal(got, ref), flush=True)
    got = np.asarray(jax.jit(v1_half)(src16, perm))
    print("v1_half close:", np.abs(got - ref).max(), flush=True)
    for name, fn, s in [("gather_half", gather_only_half, src16),
                        ("v1_half", v1_half, src16),
                        ("v1_c64", v1_c64, src)]:
        try:
            t = scan_time(fn, s, perm)
            print(f"{name}: {t * 1e3:.3f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)




def gather_hint(src, perm):
    return src.at[perm].get(unique_indices=True, indices_are_sorted=False, mode="promise_in_bounds")


def v1_hint(src, perm):
    g = src.at[perm].get(unique_indices=True, indices_are_sorted=False, mode="promise_in_bounds").reshape(NY, NX, 3, 8, 8)
    rows = [g[:, :, c, py, :] for c in range(3) for py in range(8)]
    st = jnp.stack(rows, axis=0).reshape(3, 8, NY, NX * 8)
    return st.transpose(0, 2, 1, 3).reshape(3, H, W)


def detile_nogather(src, perm):
    g = jax.lax.dynamic_slice(src, (0, 0), (NY * NX, 192))
    g = g.reshape(NY, NX, 3, 8, 8)
    rows = [g[:, :, c, py, :] for c in range(3) for py in range(8)]
    st = jnp.stack(rows, axis=0).reshape(3, 8, NY, NX * 8)
    return st.transpose(0, 2, 1, 3).reshape(3, H, W)


def main3():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((NSRC, 192)).astype(np.float32))
    perm = jnp.asarray(rng.permutation(NSRC)[:NY * NX].astype(np.int32))
    ref = np.asarray(jax.jit(v0)(src, perm))
    got = np.asarray(jax.jit(v1_hint)(src, perm))
    print("v1_hint correct:", np.array_equal(got, ref), flush=True)
    for name, fn in [("gather_hint", gather_hint),
                     ("v1_hint", v1_hint),
                     ("detile_nogather", detile_nogather)]:
        try:
            t = scan_time(fn, src, perm)
            print(f"{name}: {t * 1e3:.3f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)




def v1b(src, perm):
    g = src.at[perm].get(unique_indices=True, mode="promise_in_bounds")
    g = g.reshape(NY, NX, 3, 8, 8)
    rows = [g[:, :, c, py, :] for c in range(3) for py in range(8)]
    st = jnp.stack(rows, axis=1).reshape(NY, 3, 8, NX * 8)
    return st.transpose(1, 0, 2, 3).reshape(3, H, W)


def v1b_notr(src, perm):
    g = src.at[perm].get(unique_indices=True, mode="promise_in_bounds")
    g = g.reshape(NY, NX, 3, 8, 8)
    rows = [g[:, :, c, py, :] for c in range(3) for py in range(8)]
    return jnp.stack(rows, axis=1).reshape(NY, 24, NX * 8)


def main4():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((NSRC, 192)).astype(np.float32))
    perm = jnp.asarray(rng.permutation(NSRC)[:NY * NX].astype(np.int32))
    ref = np.asarray(jax.jit(v0)(src, perm))
    got = np.asarray(jax.jit(v1b)(src, perm))
    print("v1b correct:", np.array_equal(got, ref), flush=True)
    for name, fn in [("v1b", v1b), ("v1b_notr", v1b_notr)]:
        try:
            t = scan_time(fn, src, perm)
            print(f"{name}: {t * 1e3:.3f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)



def v6(src, perm):
    """lax.gather emitting (24, N, 8) directly: detile becomes a pure
    reshape + cheap row-permute transpose."""
    src3 = src.reshape(NSRC, 24, 8)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(0, 2), collapsed_slice_dims=(0,),
        start_index_map=(0,))
    g = jax.lax.gather(src3, perm[:, None], dn, slice_sizes=(1, 24, 8),
                       unique_indices=True, indices_are_sorted=False,
                       mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    st = g.reshape(3, 8, NY, NX * 8)
    return st.transpose(0, 2, 1, 3).reshape(3, H, W)


def v7(src, perm):
    g = src.at[perm].get(unique_indices=True, mode="promise_in_bounds")
    g = g.reshape(NY * NX, 3, 8, 8)
    rows = [g[:, c, py, :] for c in range(3) for py in range(8)]
    st = jnp.stack(rows, axis=0).reshape(3, 8, NY, NX * 8)
    return st.transpose(0, 2, 1, 3).reshape(3, H, W)


def main6():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((NSRC, 192)).astype(np.float32))
    perm = jnp.asarray(rng.permutation(NSRC)[:NY * NX].astype(np.int32))
    ref = np.asarray(jax.jit(v0)(src, perm))
    got = np.asarray(jax.jit(v6)(src, perm))
    print("v6 correct:", np.array_equal(got, ref), flush=True)
    got = np.asarray(jax.jit(v7)(src, perm))
    print("v7 correct:", np.array_equal(got, ref), flush=True)
    for name, fn in [("v1", v1), ("v6", v6), ("v7", v7)]:
        t = scan_time(fn, src, perm)
        print(f"{name}: {t * 1e3:.3f} ms", flush=True)

if __name__ == "__main__":
    import os as _os
    n = _os.environ.get("PROBE", "")
    {"2": main2, "3": main3, "4": main4, "6": main6}.get(n, main)()
