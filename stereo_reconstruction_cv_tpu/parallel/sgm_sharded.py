"""Row-sharded, batch-parallel SGBM over a device mesh.

The dense cost volume is the scale dimension of this project (a 4K x 256
volume is ~2.1G cost entries — SURVEY §5). We shard it two ways:

  batch axis  -> 'data'  (independent pairs, zero communication)
  image rows  -> 'space' (ICI halo exchange at shard boundaries)

Horizontal SGM paths are row-local, so row sharding is free for them.
Vertical/diagonal paths carry state across rows; the exact recurrence is
sequential across shards, so we use the standard halo warm-start scheme
(as in GPU tiled-SGM implementations): each shard receives `halo` extra
rows from its neighbors via `lax.ppermute` over ICI, runs its scans from a
zero carry at the extended boundary, and discards the halo outputs. SGM
path influence decays geometrically with P2 smoothing, so a modest halo
(default 32 rows) reproduces the single-device result almost everywhere
(tested >=99% of valid pixels within 1/16 px).

The speckle filter is a global connected-components pass, so it runs after
regathering rows (data-parallel over pairs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from stereo_reconstruction_cv_tpu.config import SGBMConfig
from stereo_reconstruction_cv_tpu.ops import disparity as DP


def sharded_sgbm_disparity(
    mesh: Mesh,
    left: jnp.ndarray,
    right: jnp.ndarray,
    cfg: SGBMConfig,
    halo: int = 32,
):
    """(B, H, W) uint8 pairs -> (disparity (B, H, W) f32, valid (B, H, W)).

    Batch is sharded over 'data', rows over 'space'. Call under jit with
    inputs placed via parallel.mesh.batch_row_sharding(mesh).
    """
    ns = mesh.shape["space"]
    local_rows = left.shape[1] // ns
    halo = min(halo, local_rows)  # a halo can't exceed a neighbor's rows
    if ns == 1:
        halo = 0  # no spatial sharding -> no boundaries to warm up
    core_cfg = cfg.with_(speckle_window_size=0)
    spec = P("data", "space", None)

    def exchange_halos(x):
        """Append neighbors' boundary rows: (b, h, W) -> (b, halo+h+halo, W).
        Edge shards get zero halos (their scans start at the true image
        boundary, where a zero carry is exact)."""
        top_rows = x[:, :halo]      # sent upward (to previous shard)
        bot_rows = x[:, -halo:]     # sent downward (to next shard)
        from_next = jax.lax.ppermute(
            top_rows, "space", [(i + 1, i) for i in range(ns - 1)]
        )
        from_prev = jax.lax.ppermute(
            bot_rows, "space", [(i, i + 1) for i in range(ns - 1)]
        )
        return jnp.concatenate([from_prev, x, from_next], axis=1)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec, spec), out_specs=(spec, spec)
    )
    def run(l, r):
        le = exchange_halos(l) if halo else l
        re = exchange_halos(r) if halo else r
        disp, valid = jax.vmap(lambda a, b: DP.sgbm_disparity(a, b, core_cfg))(le, re)
        if halo:
            disp, valid = disp[:, halo:-halo], valid[:, halo:-halo]
        return disp, valid

    disp, valid = run(left, right)
    if cfg.speckle_window_size > 0:
        # Global pass: full rows per pair, data-parallel over the batch.
        full = NamedSharding(mesh, P("data", None, None))
        disp = jax.lax.with_sharding_constraint(disp, full)
        valid = jax.lax.with_sharding_constraint(valid, full)
        valid = jax.vmap(
            lambda d, v: DP.speckle_filter(
                d, v, cfg.speckle_window_size, float(cfg.speckle_range)
            )
        )(disp, valid)
    return disp, valid
