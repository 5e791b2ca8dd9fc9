"""Multi-host scale-out skeleton: jax.distributed over a 2D mesh.

The scaling design of SURVEY.md §2.6/§7-step-10: animation frames/GOPs
shard across hosts (the DCN axis — frames are independent after the
host demux), and the group/block-row grid shards across the chips of
each host (the ICI axis — ppermute halo exchange for the cross-group
filters).  The reference has no cross-process story at all (it is a
single-process mobile library); this is the new design the north star
requires, with the constraint that output matches the single-device
path bit-exactly.

`multihost_dryrun()` proves the program compiles and runs under real
multi-process jax.distributed: it spawns N worker processes (CPU
platform, D virtual devices each), initializes a coordinator, builds
the global ("f", "g") mesh, runs the sharded GOP decode, and each
process verifies its addressable output shards against a locally
computed single-device reference (atol 1e-4: XLA fuses the float
filter chain differently under sharding, so the toy program is
tolerance-checked; the real-format path is the bit-exact one, see
tests/test_tpu_full.py).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np


def make_2d_mesh(n_frames_axis: int, n_groups_axis: int):
    """Global mesh over all (possibly multi-process) devices: axis "f"
    shards frames/GOPs (DCN), axis "g" shards block rows (ICI)."""
    import jax
    from jax.sharding import Mesh
    devs = np.asarray(jax.devices()[:n_frames_axis * n_groups_axis])
    return Mesh(devs.reshape(n_frames_axis, n_groups_axis), ("f", "g"))


def sharded_gop_decode_2d(mesh):
    """fn(ac (N,3,nY,nX,8,8), dc, qf, fx, fb, distance) -> (N,3,H,W):
    frames sharded over "f", block rows over "g" with ppermute halos —
    the two-level (DCN x ICI) decode program."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from . import groups as G
    from ..vardct import pipeline as pl

    halo = pl.filter_halo(1, True)

    def per_shard(ac, dc, qf, fx, fb, distance):
        def one(ac1, dc1, qf1, fx1, fb1):
            img = pl.dequant_idct(ac1, dc1, qf1, fx1, fb1, distance)
            inv = pl.inv_sigma_map(qf1, distance)
            stacked = jnp.concatenate([img, inv[None]], axis=0)
            padded = G._exchange_halo(stacked, halo, "g")
            return pl.apply_filters(padded[:3], padded[3], 1, True)
        return jax.vmap(one)(ac, dc, qf, fx, fb)

    fn = G.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("f", None, "g"), P("f", None, "g"), P("f", "g"),
                  P("f", "g"), P("f", "g"), P()),
        out_specs=P("f", None, "g"))
    return jax.jit(fn)


def _dryrun_inputs(n_frames: int, ny: int, nx: int):
    rng = np.random.default_rng(7)
    ac = rng.integers(-20, 20, (n_frames, 3, ny, nx, 8, 8)).astype(
        np.int32)
    dc = rng.integers(-100, 100, (n_frames, 3, ny, nx)).astype(np.int32)
    qf = np.full((n_frames, ny, nx), 8, np.int32)
    fx = np.zeros((n_frames, ny, nx), np.float32)
    fb = np.ones((n_frames, ny, nx), np.float32)
    return ac, dc, qf, fx, fb


def _single_device_reference(ac, dc, qf, fx, fb, distance):
    import jax.numpy as jnp
    from ..vardct import pipeline as pl
    halo = pl.filter_halo(1, True)
    outs = []
    for i in range(ac.shape[0]):
        img = pl.dequant_idct(jnp.asarray(ac[i]), jnp.asarray(dc[i]),
                              jnp.asarray(qf[i]), jnp.asarray(fx[i]),
                              jnp.asarray(fb[i]), distance)
        inv = pl.inv_sigma_map(jnp.asarray(qf[i]), distance)
        outs.append(pl.apply_filters(pl.pad_rows(img, halo),
                                     pl.pad_rows(inv, halo), 1, True))
    return np.stack([np.asarray(o) for o in outs])


def worker_main(process_id: int, num_processes: int, port: int,
                devices_per_process: int) -> None:
    """One jax.distributed participant of the multi-host dryrun."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes, process_id=process_id)
    n_dev = len(jax.devices())
    assert n_dev == num_processes * devices_per_process, n_dev
    assert len(jax.local_devices()) == devices_per_process

    import jax.numpy as jnp
    mesh = make_2d_mesh(num_processes, devices_per_process)
    n_frames = num_processes * 2            # 2 GOP frames per host
    ny = 8 * devices_per_process
    nx = 8
    ac, dc, qf, fx, fb = _dryrun_inputs(n_frames, ny, nx)
    dist = np.float32(1.0)

    from jax.sharding import NamedSharding, PartitionSpec as P
    specs = (P("f", None, "g"), P("f", None, "g"), P("f", "g"),
             P("f", "g"), P("f", "g"))

    def to_global(arr, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sh, lambda idx: arr[idx])

    gargs = [to_global(a, s) for a, s in zip((ac, dc, qf, fx, fb),
                                             specs)]
    fn = sharded_gop_decode_2d(mesh)
    out = fn(*gargs, jnp.float32(dist))
    jax.block_until_ready(out)

    ref = _single_device_reference(ac, dc, qf, fx, fb,
                                   jnp.float32(dist))
    # every process validates its own addressable shards (atol 1e-4;
    # see module docstring for why this toy program is not bit-exact)
    nbad = 0
    for shard in out.addressable_shards:
        local = np.asarray(shard.data)
        expect = ref[shard.index]
        if not np.allclose(local, expect, atol=1e-4):
            nbad += 1
    if nbad:
        print(f"[proc {process_id}] {nbad} shards diverge",
              file=sys.stderr)
        sys.exit(1)
    print(f"[proc {process_id}] OK: {len(out.addressable_shards)} "
          f"local shards of {out.shape} verified")


def multihost_dryrun(num_processes: int = 2,
                     devices_per_process: int = 4,
                     timeout: float = 600.0) -> None:
    """Spawn the jax.distributed workers and fail loudly if any
    diverges.  CPU-only (virtual devices); safe to run anywhere."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                            f"{devices_per_process}")
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "jxl_coder_tpu.parallel.multihost",
             str(pid), str(num_processes), str(port),
             str(devices_per_process)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    fail = False
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            fail = True
        outs.append(out.decode(errors="replace"))
        fail = fail or p.returncode != 0
    if fail:
        raise RuntimeError(
            "multihost dryrun failed:\n" + "\n".join(outs))
    print(f"multihost_dryrun: {num_processes} processes x "
          f"{devices_per_process} devices OK (shards within 1e-4)")


if __name__ == "__main__":
    worker_main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
                int(sys.argv[4]))
