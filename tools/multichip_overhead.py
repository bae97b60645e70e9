"""Sharded-vs-single wall-clock on the virtual 8-device CPU mesh
(VERDICT r3 item 8): the dryrun proves the multi-chip path compiles and
executes; this tool quantifies the OVERHEAD TREND of row-sharding as
n_space grows — collective/halo cost relative to the single-shard run of
the same program, not absolute perf (the virtual mesh timeshares one CPU,
so ideal scaling would show ~flat wall-clock, and every extra ms is
sharding overhead: halo ppermute, carry handoff, partitioning).

Writes docs/MULTICHIP_SCALING.md with halo + exact rows for
n_space in {1, 2, 4} at a mid shape, plus halo-vs-exact agreement.

Usage: python tools/multichip_overhead.py  (self-provisions the CPU mesh
in a subprocess exactly like __graft_entry__.dryrun_multichip).
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))

N_DEVICES = 8
H, W, D = 512, 640, 64
ITERS = 5


def _body():
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from stereo_reconstruction_cv_tpu.config import SGBMConfig
    from stereo_reconstruction_cv_tpu.parallel import mesh as M
    from stereo_reconstruction_cv_tpu.parallel.sgm_sharded import (
        sharded_sgbm_disparity,
    )

    import cv2

    imL = cv2.resize(cv2.imread("/root/reference/dataset/d2/img1.jpg", 0), (W, H))
    imR = cv2.resize(cv2.imread("/root/reference/dataset/d2/img2.jpg", 0), (W, H))
    left = jnp.asarray(imL[None])
    right = jnp.asarray(imR[None])
    cfg = SGBMConfig(num_disparities=D, num_directions=8, speckle_window_size=0)

    rows = []
    ref = None
    for n_space in (1, 2, 4):
        mesh = M.make_mesh(n_data=1, n_space=n_space)
        lj = jax.device_put(left, M.batch_row_sharding(mesh))
        rj = jax.device_put(right, M.batch_row_sharding(mesh))
        for mode, kw in (("halo", {"halo": 16}), ("exact", {"exact": True})):
            fn = jax.jit(lambda a, b, kw=kw, mesh=mesh: sharded_sgbm_disparity(
                mesh, a, b, cfg, **kw))
            out = fn(lj, rj)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(lj, rj)
                jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / ITERS
            rows.append((n_space, mode, dt))
            if n_space == 1 and mode == "halo":
                ref = dt
            if mode == "halo":
                halo_disp, halo_valid = out[0], out[1]
            else:
                # Same definition as the driver dryrun and the cv2 parity
                # gate: within 1 px on pixels valid in BOTH modes.
                bv = halo_valid & out[1]
                close = jnp.abs(halo_disp - out[0]) <= 1.0
                agree = float(jnp.sum((bv & close).astype(jnp.float32))
                              / jnp.maximum(jnp.sum(bv.astype(jnp.float32)), 1.0))
        print(f"n_space={n_space}: agreement {100*agree:.2f}%", flush=True)

    lines = [
        "# Multi-chip row-sharding overhead (virtual 8-device CPU mesh)",
        "",
        f"Shape {H}x{W}, {D} disparities, 8-dir, speckle off; {ITERS} timed",
        "iterations after warm-up. The virtual mesh timeshares ONE host CPU,",
        "so perfect sharding would keep wall-clock ~flat as n_space grows;",
        "growth over the n_space=1 row is collective/partitioning overhead",
        "(halo ppermute for the approximate mode, sequential carry handoff",
        "for the exact mode). Absolute times are CPU-backend numbers and",
        "carry no TPU meaning.",
        "",
        "| n_space | mode | wall ms/frame | vs n_space=1 halo |",
        "|---|---|---|---|",
    ]
    for n_space, mode, dt in rows:
        lines.append(
            f"| {n_space} | {mode} | {dt*1e3:.1f} | {dt/ref:.2f}x |"
        )
    lines += [
        "",
        f"halo-vs-exact agreement at n_space=4: {100*agree:.2f}% of",
        "both-valid pixels within 1 px (the cv2-parity-gate definition;",
        "also asserted >= 99% on every driver dryrun,",
        "__graft_entry__._dryrun_multichip_body).",
        "",
    ]
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                            "docs", "MULTICHIP_SCALING.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path}")


def main():
    import jax

    if len(jax.devices()) >= N_DEVICES and jax.default_backend() == "cpu":
        _body()
        return 0
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={N_DEVICES}"
    ).strip()
    code = "from tools.multichip_overhead import _body; _body()"
    repo_root = os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo_root)
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
