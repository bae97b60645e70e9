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
try:  # jax >= 0.8 promotes shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from stereo_reconstruction_cv_tpu.config import SGBMConfig
from stereo_reconstruction_cv_tpu.ops import disparity as DP

# Rows of cost-volume halo needed for exact C at shard boundaries:
# x-Sobel reads y±1 and the 11x11 block sum reads y±5.
_COST_HALO = 6


def sharded_sgbm_disparity(
    mesh: Mesh,
    left: jnp.ndarray,
    right: jnp.ndarray,
    cfg: SGBMConfig,
    halo: int = 32,
    exact: bool = False,
):
    """(B, H, W) uint8 pairs -> (disparity (B, H, W) f32, valid (B, H, W)).

    Batch is sharded over 'data', rows over 'space'. Call under jit with
    inputs placed via parallel.mesh.batch_row_sharding(mesh).

    exact=True switches from halo warm-start to sequential carry handoff
    (sharded_sgbm_disparity_exact): bit-reproducible across mesh sizes,
    at the cost of serializing the vertical sweeps across 'space'.
    """
    if exact:
        return sharded_sgbm_disparity_exact(mesh, left, right, cfg)
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


# ---------------------------------------------------------------------------
# Exact mode: sequential carry handoff across 'space'
# ---------------------------------------------------------------------------

def _scan_rows_carry(C, dx: int, dy: int, p1: int, p2: int, carry):
    """One vertical/diagonal SGM direction over local rows with an incoming
    DP carry; returns (L volume, outgoing carry).

    Same recurrence as ops.disparity._scan_dir (dy != 0, plain scan), but
    the carry enters/exits so shards can chain exactly: the predecessor of
    a shard's first row is the previous shard's last row, including the
    diagonal column shift (applied to the carry inside the first step,
    exactly as the single-device scan applies it between those two rows)."""
    vol = C if dy > 0 else C[::-1]
    shift = -dx

    def f(c, row):
        prev = DP._shift_cols(c, shift) if dx != 0 else c
        L = DP._sgm_step(prev, row, p1, p2)
        return L, L

    carry_out, out = jax.lax.scan(f, carry, vol)
    return (out if dy > 0 else out[::-1]), carry_out


def _replicated_halos(x, hb: int, ns: int):
    """Append hb neighbor rows on each side of the local row block.

    Interior boundaries receive the neighbor's true rows via ppermute;
    true image edges receive REPLICATED boundary rows, which reproduces
    the mode="edge" padding of the Sobel prefilter and the block sum —
    so the cost volume computed on the extended block, cropped by hb,
    is bit-identical to the single-device one."""
    my = jax.lax.axis_index("space")
    top = x[:, :hb]
    bot = x[:, -hb:]
    from_next = jax.lax.ppermute(top, "space", [(i + 1, i) for i in range(ns - 1)])
    from_prev = jax.lax.ppermute(bot, "space", [(i, i + 1) for i in range(ns - 1)])
    rep_first = jnp.repeat(x[:, :1], hb, axis=1)
    rep_last = jnp.repeat(x[:, -1:], hb, axis=1)
    from_prev = jnp.where(my == 0, rep_first, from_prev)
    from_next = jnp.where(my == ns - 1, rep_last, from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=1)


def sharded_sgbm_disparity_exact(
    mesh: Mesh,
    left: jnp.ndarray,
    right: jnp.ndarray,
    cfg: SGBMConfig,
):
    """Row-sharded SGBM that is BIT-IDENTICAL to the single-device XLA
    backend (ops.disparity.sgbm_disparity with backend='xla', plain scans).

    Horizontal paths and every per-pixel stage are row-local; the cost
    volume uses an exact 6-row halo; the vertical/diagonal paths hand
    their (W, D) DP carries shard-to-shard over ICI (lax.ppermute) in
    path order — ns sequential rounds, each round computing one shard's
    rows while the others idle. Exactness therefore costs ~ns x the
    vertical-sweep time; use the default halo warm-start mode when
    bit-reproducibility across mesh shapes is not required
    (VERDICT r2 item 7; reference hot loop main.ipynb cell 10)."""
    ns = mesh.shape["space"]
    spec = P("data", "space", None)
    cap = cfg.pre_filter_cap
    x0 = cfg.min_disparity + cfg.num_disparities
    dirs = DP.DIRS_8 if cfg.num_directions == 8 else DP.DIRS_5
    h_dirs = [d for d in dirs if d[1] == 0]
    down_dirs = [d for d in dirs if d[1] == 1]
    up_dirs = [d for d in dirs if d[1] == -1]

    def local_cost(a, b, my):
        """Exact local cost volume from hb-extended row blocks.

        Sobel and BT run on the extended rows (interior halo rows are the
        neighbor's true rows, so their BT is exact given >= 1 row of sobel
        context). At TRUE image edges the halo BT rows are overwritten
        with the edge row's BT: the single-device block_sum edge-pads the
        *cost* rows, and sobel-of-replicated-image-rows does not equal
        the edge row's sobel (it loses the y-gradient)."""
        hb = _COST_HALO
        h = a.shape[0] - 2 * hb
        sl = DP.xsobel_clip(a, cap)
        sr = DP.xsobel_clip(b, cap)
        capv = jnp.int32(cap)
        planes = []
        for p in (sl, sr, a.astype(jnp.int32), b.astype(jnp.int32)):
            planes.append(p.at[:, 0].set(capv).at[:, -1].set(capv))
        sl, sr, rawl, rawr = planes
        C = DP.bt_cost_volume(
            sl, sr, rawl, rawr, cfg.num_disparities, cfg.min_disparity
        )
        top_fix = jnp.repeat(C[hb : hb + 1], hb, axis=0)
        bot_fix = jnp.repeat(C[hb + h - 1 : hb + h], hb, axis=0)
        C = jnp.where((my == 0)[None, None, None],
                      jnp.concatenate([top_fix, C[hb:]], axis=0), C)
        C = jnp.where((my == ns - 1)[None, None, None],
                      jnp.concatenate([C[:-hb], bot_fix], axis=0), C)
        C = DP.block_sum(C[:, x0:, :], cfg.block_size)
        # int16 storage -> int32 for the DP scans (as sgm_aggregate does).
        return C[hb:-hb].astype(jnp.int32)

    def seq_dirs(C, dir_list, reverse_order: bool):
        """Sum of L volumes for directions whose scans cross shards,
        chained sequentially over 'space' (reversed order for upward
        paths, which flow from the last shard to the first)."""
        my = jax.lax.axis_index("space")
        S = jnp.zeros_like(C)
        order = list(range(ns - 1, -1, -1)) if reverse_order else list(range(ns))
        perm = (
            [(i, i - 1) for i in range(1, ns)]
            if reverse_order
            else [(i, i + 1) for i in range(ns - 1)]
        )
        for dx, dy in dir_list:
            # Derive the zero carry from C so it carries C's varying-axes
            # type under shard_map (a fresh jnp.zeros is 'unvarying' and
            # fails lax.scan's carry typing).
            carry = jnp.zeros_like(C[:, 0])
            out_d = jnp.zeros_like(C)
            for step, k in enumerate(order):
                out, carry_out = jax.vmap(
                    lambda c, cr: _scan_rows_carry(c, dx, dy, cfg.p1, cfg.p2, cr)
                )(C, carry)
                out_d = jnp.where(my == k, out, out_d)
                if step < ns - 1:
                    sent = jax.lax.ppermute(carry_out, "space", perm)
                    nxt = order[step + 1]
                    carry = jnp.where(my == nxt, sent, carry)
            S = S + out_d
        return S

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec, spec), out_specs=(spec, spec)
    )
    def run(l, r):
        my = jax.lax.axis_index("space")
        le = _replicated_halos(l, _COST_HALO, ns)
        re = _replicated_halos(r, _COST_HALO, ns)
        C = jax.vmap(lambda a, b: local_cost(a, b, my))(le, re)
        S = jnp.zeros_like(C)
        for dx, _ in h_dirs:
            S = S + jax.vmap(
                lambda c: DP._scan_dir(c, dx, 0, cfg.p1, cfg.p2, None)
            )(C)
        S = S + seq_dirs(C, down_dirs, reverse_order=False)
        if up_dirs:
            S = S + seq_dirs(C, up_dirs, reverse_order=True)
        disp, valid = jax.vmap(
            lambda s: DP.wta_disparity(s, cfg.min_disparity, cfg.uniqueness_ratio)
        )(S)
        if cfg.disp12_max_diff >= 0:
            valid &= jax.vmap(
                lambda s, d: DP.lr_check(
                    s, d, cfg.min_disparity, cfg.disp12_max_diff
                )
            )(S, disp)
        disp = jnp.pad(
            disp, ((0, 0), (0, 0), (x0, 0)),
            constant_values=float(cfg.min_disparity - 1),
        )
        valid = jnp.pad(valid, ((0, 0), (0, 0), (x0, 0)), constant_values=False)
        return disp, valid

    disp, valid = run(left, right)
    if cfg.speckle_window_size > 0:
        full = NamedSharding(mesh, P("data", None, None))
        disp = jax.lax.with_sharding_constraint(disp, full)
        valid = jax.lax.with_sharding_constraint(valid, full)
        valid = jax.vmap(
            lambda d, v: DP.speckle_filter(
                d, v, cfg.speckle_window_size, float(cfg.speckle_range)
            )
        )(disp, valid)
    return disp, valid
