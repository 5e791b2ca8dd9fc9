"""Headline benchmark: 4K VarDCT device decode throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the device decode pipeline (dequant + CfL + IDCT + Gaborish +
EPF + XYB->sRGB) on 3840x2160 frames — the hot loop of SURVEY.md §3.1
re-expressed for TPU.  The K-frame loop runs ON DEVICE via lax.scan so a
single dispatch amortizes tunnel/dispatch latency; completion is forced
by fetching the device-side checksum (block_until_ready is unreliable
over the axon tunnel).

vs_baseline: ratio against the BASELINE.md target of 2x libjxl-8-thread
CPU 4K VarDCT decode.  djxl is not available in this image; we use the
documented estimate of 120 MP/s for libjxl-8-thread-class CPU decode
=> target 240 MP/s (recorded in BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_TARGET_MPS = 240.0  # 2x libjxl 8-thread CPU estimate (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = "/tmp/jxl_tpu_xla_cache"
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jxl_coder_tpu.vardct import pipeline as P

    w, h = 3840, 2160
    ny, nx = h // 8, w // 8
    K = 16  # frames per dispatch
    rng = np.random.default_rng(0)
    ac = np.zeros((3, ny, nx, 8, 8), np.int32)
    mask = rng.random((3, ny, nx, 8, 8)) < 0.1
    ac[mask] = rng.integers(-30, 30, int(mask.sum()))
    dc = rng.integers(-200, 200, (3, ny, nx)).astype(np.int32)
    qf = np.full((ny, nx), 8, np.int32)
    ty, tx = -(-ny // 8), -(-nx // 8)

    ac = ac.astype(np.int16)
    ac_d = jnp.asarray(ac)
    dc_d = jnp.asarray(dc)
    qf_d = jnp.asarray(qf)
    cx_d = jnp.zeros((ty, tx), jnp.int32)
    cb_d = jnp.full((ty, tx), 64, jnp.int32)
    dist = jnp.float32(1.0)

    @jax.jit
    def run_k(ac, dc, qf, cx, cb, d):
        def body(carry, i):
            # vary the input per iteration so no step can be elided
            a = ac + i.astype(jnp.int16)
            out = P.reconstruct_srgb8(a, dc, qf, cx, cb, d, epf_iters=1,
                                      gab=True)
            return carry + jnp.sum(out.astype(jnp.uint32)), None

        total, _ = jax.lax.scan(body, jnp.uint32(0), jnp.arange(K))
        return total

    # compile + warmup (cached across runs via the persistent cache)
    _ = int(run_k(ac_d, dc_d, qf_d, cx_d, cb_d, dist))

    reps = 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        checksum = int(run_k(ac_d, dc_d, qf_d, cx_d, cb_d, dist))
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
