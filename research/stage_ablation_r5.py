"""Round-5 device-frame stage ablation: attribute the 8.3 ms frame to
synthesis / gather+detile / filters / srgb by timing truncated
pipelines on the real chip.  Usage: python research/stage_ablation_r5.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))
os.environ.setdefault("JXL_TPU_DEVICE", "1")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jxl_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jxl_coder_tpu.bitstream.reader import BitReader
from jxl_coder_tpu.bitstream import container as container_mod
from jxl_coder_tpu.bitstream.headers import read_image_header
from jxl_coder_tpu.bitstream.frame_header import (read_frame_header,
                                                  read_toc)
from jxl_coder_tpu.vardct import dec_real, tpu_full as TF
from jxl_coder_tpu.vardct.tpu_full import (_synth_family,
                                           _filters_chain_device,
                                           EPF_SIGMA_PER)

K = 16
W, H = 3840, 2160


def load_state():
    data = open("/tmp/jxl_tpu_bench4k_v2.jxl", "rb").read()
    cs = container_mod.extract_codestream(data).codestream
    br = BitReader(cs)
    hdr = read_image_header(br)
    fh = read_frame_header(br, hdr)
    ng, ndc = fh.counts(hdr)
    n = 1 if (ng == 1 and fh.passes.num_passes == 1) else (
        2 + ndc + ng * fh.passes.num_passes)
    toc = read_toc(br, n)
    state = {}
    dec_real.decode_vardct_frame(cs, hdr, fh, toc, state_out=state)
    return state


def timed(fn_k, args, label):
    _ = int(fn_k(*args))
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        _ = int(fn_k(*args))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{label:28s} {best*1000:7.2f} ms/frame "
          f"{W*H/best/1e6:8.1f} MP/s", flush=True)
    return best


def main():
    state = load_state()
    static, args, mask = TF.prepare_exec(state)
    desc = static["desc"]
    H8, W8 = static["H8"], static["W8"]
    bits = static["bits"]
    gabw = np.asarray(static["gabw_t"], np.float32)
    epf_iters = static["epf_iters"]
    gab = static["gab"]
    p0s, p2s = static["pass0_scale"], static["pass2_scale"]
    crop_h, crop_w = static["crop_h"], static["crop_w"]
    args = jax.device_put(args)

    def stage_fn(upto):
        def fn(fams, dc_glob, qf_map, sharp_map, igs, qm, perm_inv):
            fam_tiles = [
                _synth_family(dc_glob, fam, sid, n_pad, bh, bw, cov,
                              special, qm)
                for fam, (sid, n_pad, bh, bw, cov, special)
                in zip(fams, desc)]
            all_tiles = (fam_tiles[0] if len(fam_tiles) == 1
                         else jnp.concatenate(fam_tiles, axis=0))
            if upto == "synth":
                return jnp.sum(all_tiles)
            ny, nx = H8 // 8, W8 // 8
            g = all_tiles.at[perm_inv].get(unique_indices=True,
                                           mode="promise_in_bounds")
            if upto == "gather":
                return jnp.sum(g)
            g = g.reshape(ny, nx, 3, 8, 8)
            rows = [g[:, :, c, py, :] for c in range(3)
                    for py in range(8)]
            st = jnp.stack(rows, axis=0).reshape(3, 8, ny, W8)
            frame = st.transpose(0, 2, 1, 3).reshape(3, H8, W8)
            if upto == "detile":
                return jnp.sum(frame)
            planes = [frame[0], frame[1], frame[2]]
            X, Y, B = planes
            sigma = (EPF_SIGMA_PER * sharp_map.astype(jnp.float32)
                     * igs / jnp.maximum(qf_map.astype(jnp.float32),
                                         1.0))
            res = _filters_chain_device(X, Y, B, sigma, gab, epf_iters,
                                        gabw, p0s, p2s,
                                        to_srgb_bits=None)
            X, Y, B = res
            if upto == "filters":
                return jnp.sum(X) + jnp.sum(Y) + jnp.sum(B)
            from jxl_coder_tpu.vardct.tpu_real import xyb_to_srgb8_device
            return jnp.sum(
                xyb_to_srgb8_device(X, Y, B).astype(jnp.uint32))
        return fn

    for upto in ("synth", "gather", "detile", "filters", "srgb"):
        fn = stage_fn(upto)

        def run_k(fams_, dc_, qf_, sharp_, igs, qm_, perm_,
                  _fn=fn):
            def body(carry, i):
                dc2 = dc_ + i.astype(jnp.float32) * 1e-6
                o = _fn(fams_, dc2, qf_, sharp_, igs, qm_, perm_)
                return carry + o.astype(jnp.float32), None
            tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
            return tot
        timed(jax.jit(run_k), args, upto)


if __name__ == "__main__":
    main()
