"""Bench fused_real_filters3 tile sizes at 4K width (vmem limit raised)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jxl_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jxl_coder_tpu.vardct.filters_pallas import fused_real_filters3

W = 3840
K = 16


def bench(tile, hp):
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((hp, W)).astype(np.float32) * 0.02)
    Y = jnp.asarray(rng.standard_normal((hp, W)).astype(np.float32) * 0.3
                    + 0.4)
    B = jnp.asarray(rng.standard_normal((hp, W)).astype(np.float32) * 0.3
                    + 0.4)
    inv = jnp.asarray(-np.abs(rng.standard_normal(
        (hp // 8, W // 8))).astype(np.float32))

    @jax.jit
    def run(x, y, b, i_):
        def body(carry, k):
            o = fused_real_filters3(x + k.astype(jnp.float32) * 1e-7, y, b,
                                    i_, tile=tile, epf_iters=2,
                                    to_srgb=True, bits=8)
            return carry + jnp.sum(o.astype(jnp.uint32)), None
        tot, _ = jax.lax.scan(body, jnp.uint32(0), jnp.arange(K))
        return tot

    _ = int(run(X, Y, B, inv))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = int(run(X, Y, B, inv))
        best = min(best, (time.perf_counter() - t0) / K)
    return best


for tile, hp in [(24, 2184), (32, 2176), (40, 2200), (48, 2208),
                 (72, 2232), (96, 2208)]:
    try:
        t = bench(tile, hp)
        print(f"tile={tile} hp={hp}: {t * 1e3:.3f} ms", flush=True)
    except Exception as e:
        print(f"tile={tile}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
