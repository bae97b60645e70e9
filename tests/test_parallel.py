"""Multi-device tests on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8 — SURVEY §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stereo_reconstruction_cv_tpu.config import SGBMConfig
from stereo_reconstruction_cv_tpu.ops import disparity as DP
from stereo_reconstruction_cv_tpu.parallel import mesh as M
from stereo_reconstruction_cv_tpu.parallel.sgm_sharded import (
    sharded_sgbm_disparity,
    sharded_speckle_filter,
)


def make_batch(rng, B=2, H=96, W=128, d0=8):
    base = rng.uniform(0, 255, size=(B, H, W + d0)).astype(np.float32)
    left = base[:, :, d0:]
    right = base[:, :, :-d0]
    return left.astype(np.uint8), right.astype(np.uint8)


@pytest.fixture(scope="module")
def cfg():
    return SGBMConfig(num_disparities=16, num_directions=8, speckle_window_size=0)


@pytest.mark.slow
class TestShardedSGM:
    def test_matches_single_device(self, cfg):
        """Halo warm-start vs exact single-device SGM on textured data.

        (Pure random noise is the adversarial case — decisions are knife-edge
        ties there — so the gate uses a real image, the intended workload.)"""
        import cv2

        img = cv2.resize(cv2.imread("/root/reference/dataset/d2/img1.jpg", 0), (320, 192))
        d0 = 8
        left = np.stack([img[:, d0:], img[::-1, d0:]])
        right = np.stack([img[:, :-d0], img[::-1, :-d0]])
        mesh = M.make_mesh(n_data=2, n_space=4)
        lj = jax.device_put(jnp.asarray(left), M.batch_row_sharding(mesh))
        rj = jax.device_put(jnp.asarray(right), M.batch_row_sharding(mesh))
        disp_s, valid_s = jax.jit(
            lambda a, b: sharded_sgbm_disparity(mesh, a, b, cfg, halo=32)
        )(lj, rj)
        # single-device reference
        disp_1, valid_1 = jax.vmap(lambda a, b: DP.sgbm_disparity(a, b, cfg))(
            jnp.asarray(left), jnp.asarray(right)
        )
        ds, d1 = np.asarray(disp_s), np.asarray(disp_1)
        vs, v1 = np.asarray(valid_s), np.asarray(valid_1)
        both = vs & v1
        agree = (np.abs(ds - d1)[both] <= 1.0).mean()
        assert agree >= 0.99, f"sharded vs single agreement {agree:.4f}"
        iou = (vs & v1).sum() / ((vs | v1).sum() + 1e-9)
        assert iou > 0.93, f"valid IoU {iou:.3f}"

    def test_data_only_sharding(self, rng, cfg):
        left, right = make_batch(rng, B=8, H=64, W=96)
        mesh = M.make_mesh(n_data=8, n_space=1)
        lj = jax.device_put(jnp.asarray(left), M.batch_row_sharding(mesh))
        rj = jax.device_put(jnp.asarray(right), M.batch_row_sharding(mesh))
        disp_s, _ = jax.jit(
            lambda a, b: sharded_sgbm_disparity(mesh, a, b, cfg, halo=16)
        )(lj, rj)
        disp_1, _ = jax.vmap(lambda a, b: DP.sgbm_disparity(a, b, cfg))(
            jnp.asarray(left), jnp.asarray(right)
        )
        np.testing.assert_allclose(np.asarray(disp_s), np.asarray(disp_1), atol=1e-5)

    def test_capped_run_counts_exact(self, rng):
        """_capped_run_counts == min(run length, cap+1) vs a numpy
        reference on random sorted label arrays (the sharded epilogue's
        per-shard count primitive)."""
        from stereo_reconstruction_cv_tpu.parallel.sgm_sharded import (
            _capped_run_counts,
        )

        for cap in (5, 20, 100):
            vals = np.sort(rng.integers(0, 40, size=(3, 500)), axis=1)
            got = np.asarray(_capped_run_counts(jnp.asarray(vals), cap))
            for b in range(vals.shape[0]):
                uniq, counts = np.unique(vals[b], return_counts=True)
                table = dict(zip(uniq.tolist(), counts.tolist()))
                want = np.minimum(
                    np.array([table[v] for v in vals[b].tolist()]), cap + 1
                )
                np.testing.assert_array_equal(got[b], want)

    def test_keep_sort_tiny_frame_edge(self):
        """_component_keep_sort when the whole frame is smaller than the
        size threshold: nothing can survive (windowed-OR shift guards)."""
        lab = jnp.zeros((4, 8), jnp.int32)  # one 32-px component
        keep = DP._component_keep_sort(lab, 100)
        assert not bool(np.asarray(keep).any())
        keep2 = DP._component_keep_sort(lab, 31)  # size 32 > 31 -> kept
        assert bool(np.asarray(keep2).all())

    def test_sharded_speckle_exact_vs_single_device(self, rng):
        """Row-sharded speckle flood + keep == single-device speckle_filter
        bit-for-bit, on maps with components crossing shard boundaries AND
        on adversarial noise (r5, VERDICT r4 item 1b)."""
        B, H, W = 2, 96, 128
        mesh = M.make_mesh(n_data=2, n_space=4)  # shards of 24 rows
        # Structured map: background plane, one 3-wide snake crossing all
        # shard boundaries (size > 50 -> kept), small islands straddling
        # boundaries (size <= 50 -> removed), invalid holes.
        disp = np.full((B, H, W), 10.0, np.float32)
        valid = rng.uniform(size=(B, H, W)) > 0.15
        disp[:, 10:90, 5:8] = 200.0   # snake: crosses rows 24/48/72
        valid[:, 10:90, 5:8] = True
        disp[:, 22:27, 40:45] = 120.0  # 25-px island straddling row 24
        valid[:, 22:27, 40:45] = True
        disp[:, 47:50, 60:63] = 150.0  # 9-px island straddling row 48
        valid[:, 47:50, 60:63] = True
        # Adversarial: second batch element pure noise
        disp[1] = (rng.integers(0, 6, size=(H, W)) * 40).astype(np.float32)
        lj = jax.device_put(jnp.asarray(disp), M.batch_row_sharding(mesh))
        vj = jax.device_put(jnp.asarray(valid), M.batch_row_sharding(mesh))
        keep_s = jax.jit(
            lambda d, v: sharded_speckle_filter(mesh, d, v, 50, 32.0)
        )(lj, vj)
        keep_1 = jax.vmap(
            lambda d, v: DP.speckle_filter(d, v, 50, 32.0)
        )(jnp.asarray(disp), jnp.asarray(valid))
        np.testing.assert_array_equal(np.asarray(keep_s), np.asarray(keep_1))
        # sanity: the snake survived, the islands did not
        ks = np.asarray(keep_s)
        assert ks[0, 40:60, 5:8].all()
        assert not ks[0, 22:27, 40:45].any()
        assert not ks[0, 47:50, 60:63].any()

    def test_speckle_runs_globally(self, rng):
        cfg = SGBMConfig(num_disparities=16, num_directions=8, speckle_window_size=50)
        left, right = make_batch(rng, B=2, H=96, W=128)
        mesh = M.make_mesh(n_data=2, n_space=4)
        lj = jax.device_put(jnp.asarray(left), M.batch_row_sharding(mesh))
        rj = jax.device_put(jnp.asarray(right), M.batch_row_sharding(mesh))
        disp, valid = jax.jit(
            lambda a, b: sharded_sgbm_disparity(mesh, a, b, cfg, halo=32)
        )(lj, rj)
        assert np.asarray(valid).any()


class TestExactSharded:
    def test_bit_exact_vs_single_device(self, rng):
        """Exact mode (sequential carry handoff) == single-device XLA SGBM,
        bit for bit, even on adversarial random noise (VERDICT r2 item 7)."""
        cfg = SGBMConfig(num_disparities=16, num_directions=8,
                         speckle_window_size=0, backend="xla")
        left, right = make_batch(rng, B=2, H=96, W=192)
        mesh = M.make_mesh(n_data=2, n_space=4)
        lj = jax.device_put(jnp.asarray(left), M.batch_row_sharding(mesh))
        rj = jax.device_put(jnp.asarray(right), M.batch_row_sharding(mesh))
        disp_s, valid_s = jax.jit(
            lambda a, b: sharded_sgbm_disparity(mesh, a, b, cfg, exact=True)
        )(lj, rj)
        disp_1, valid_1 = jax.vmap(lambda a, b: DP.sgbm_disparity(a, b, cfg))(
            jnp.asarray(left), jnp.asarray(right)
        )
        assert np.array_equal(np.asarray(valid_s), np.asarray(valid_1))
        np.testing.assert_array_equal(np.asarray(disp_s), np.asarray(disp_1))

    def test_bit_exact_across_mesh_shapes(self, rng):
        """The same pair produces identical bits on 1x4 and 2x2 meshes."""
        cfg = SGBMConfig(num_disparities=16, num_directions=5,
                         speckle_window_size=0, backend="xla")
        left, right = make_batch(rng, B=2, H=64, W=128)
        outs = []
        for nd, ns in [(2, 2), (1, 4)]:
            mesh = M.make_mesh(n_data=nd, n_space=ns)
            lj = jax.device_put(jnp.asarray(left[:nd]), M.batch_row_sharding(mesh))
            rj = jax.device_put(jnp.asarray(right[:nd]), M.batch_row_sharding(mesh))
            d, v = jax.jit(
                lambda a, b: sharded_sgbm_disparity(mesh, a, b, cfg, exact=True)
            )(lj, rj)
            outs.append((np.asarray(d), np.asarray(v)))
        for d, v in outs[1:]:
            np.testing.assert_array_equal(d[:1], outs[0][0][:1])
            assert np.array_equal(v[:1], outs[0][1][:1])

    @pytest.mark.slow
    def test_realistic_shape_agreement(self):
        """Realistic shape (512x768x64, mesh 2x4): exact mode is
        bit-identical; halo warm-start agrees on >=99.5% of pixels."""
        import cv2

        img = cv2.resize(
            cv2.imread("/root/reference/dataset/d2/img1.jpg", 0), (832, 512)
        )
        d0 = 64
        left = np.stack([img[:, d0:], img[::-1, d0:]])
        right = np.stack([img[:, :-d0], img[::-1, :-d0]])  # (2, 512, 768)
        cfg = SGBMConfig(num_disparities=64, num_directions=8,
                         speckle_window_size=0, backend="xla")
        mesh = M.make_mesh(n_data=2, n_space=4)
        lj = jax.device_put(jnp.asarray(left), M.batch_row_sharding(mesh))
        rj = jax.device_put(jnp.asarray(right), M.batch_row_sharding(mesh))
        disp_e, valid_e = jax.jit(
            lambda a, b: sharded_sgbm_disparity(mesh, a, b, cfg, exact=True)
        )(lj, rj)
        disp_h, valid_h = jax.jit(
            lambda a, b: sharded_sgbm_disparity(mesh, a, b, cfg, halo=32)
        )(lj, rj)
        disp_1, valid_1 = jax.vmap(lambda a, b: DP.sgbm_disparity(a, b, cfg))(
            jnp.asarray(left), jnp.asarray(right)
        )
        np.testing.assert_array_equal(np.asarray(disp_e), np.asarray(disp_1))
        assert np.array_equal(np.asarray(valid_e), np.asarray(valid_1))
        vh, v1 = np.asarray(valid_h), np.asarray(valid_1)
        both = vh & v1
        diff = np.abs(np.asarray(disp_h) - np.asarray(disp_1))[both]
        # Same agreement definition as the cv2 parity gate, the driver
        # dryrun and docs/MULTICHIP_SCALING.md: within 1 px on both-valid
        # pixels. Subpixel (1/16) agreement is structurally looser for the
        # halo warm-start (~92% here — boundary rows see slightly
        # different path costs, which the subpixel parabola amplifies)
        # and is tracked, not gated.
        agree_1px = (diff <= 1.0).mean()
        assert agree_1px >= 0.995, f"halo warm-start agreement {agree_1px:.4f}"
        assert (diff <= 1 / 16).mean() >= 0.85


@pytest.mark.slow
class TestStreaming:
    def test_stream_reconstruct_emits_clouds(self, tmp_path, cfg):
        from stereo_reconstruction_cv_tpu.parallel.streaming import stream_reconstruct

        pairs = [
            ("/root/reference/dataset/d2/img1.jpg", "/root/reference/dataset/d2/img2.jpg")
        ] * 3
        Q = np.array(
            [[1, 0, 0, -960.0], [0, 1, 0, -540.0], [0, 0, 0, 1000.0], [0, 0, 1 / 0.14, 0]]
        )
        small_cfg = cfg.with_(num_disparities=16)
        # CPU test: tiny crops via a wrapper loader is overkill; run 1080p
        # batch of 3 with 16 disparities on the 8-device mesh.
        mesh = M.make_mesh(n_data=1, n_space=4)
        out = stream_reconstruct(pairs, Q, small_cfg, str(tmp_path), batch_size=1, mesh=mesh)
        assert len(out) == 3
        from stereo_reconstruction_cv_tpu.io.ply import read_ply

        pts, _ = read_ply(out[0])
        assert len(pts) > 1000
