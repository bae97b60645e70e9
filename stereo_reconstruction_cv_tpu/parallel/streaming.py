"""Streaming batched stereo-video pipeline (BASELINE config 5).

Pairs flow from disk through the native-decode prefetch loader into a
batched dense step (SGBM -> disparity -> 3D reprojection) on the device
mesh, with point clouds emitted per pair. Decode of batch k+1 overlaps the
device compute of batch k; the dense step itself is one jitted program
batch-sharded over 'data' (rows over 'space' when the mesh has one).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from stereo_reconstruction_cv_tpu.config import SGBMConfig
from stereo_reconstruction_cv_tpu.io import ply as PLY
from stereo_reconstruction_cv_tpu.ops import disparity as DP
from stereo_reconstruction_cv_tpu.ops import geometry as G
from stereo_reconstruction_cv_tpu.parallel import mesh as M
from stereo_reconstruction_cv_tpu.parallel.prefetch import PrefetchLoader
from stereo_reconstruction_cv_tpu.parallel.sgm_sharded import sharded_sgbm_disparity


def dense_batch_step(left, right, Q, cfg: SGBMConfig, mesh: Optional[Mesh] = None):
    """(B, H, W) pairs -> (disparity (B, H, W), points (B, H, W, 3), valid).

    One jitted program: SGBM + Q-reprojection, batched (and mesh-sharded
    when a mesh is given)."""
    if mesh is not None:
        disp, valid = sharded_sgbm_disparity(mesh, left, right, cfg)
    else:
        disp, valid = jax.vmap(lambda a, b: DP.sgbm_disparity(a, b, cfg))(left, right)
    pts = jax.vmap(lambda d: G.reproject_image_to_3d(d, jnp.asarray(Q, jnp.float32)))(disp)
    return disp, pts, valid


def stream_reconstruct(
    pairs: Sequence[Tuple[str, str]],
    Q: np.ndarray,
    cfg: SGBMConfig,
    out_dir: str,
    batch_size: int = 2,
    mesh: Optional[Mesh] = None,
    prefetch: int = 2,
) -> List[str]:
    """Stream stereo pairs -> per-pair PLY point clouds. Returns paths.

    The prefetch loader decodes ahead (native libjpeg, GIL released) and
    places batches on the mesh while the previous batch computes.

    Note: per-pair wall time is dominated by the device->host fetch of the
    (disparity, points) arrays (~35 MB/pair at 1080p). On a directly
    attached TPU host that is PCIe-speed; through this dev environment's
    remote-TPU relay it is seconds, so measured e2e throughput here badly
    understates production throughput (device compute is ~70-120 ms/pair)."""
    os.makedirs(out_dir, exist_ok=True)
    sharding = M.batch_row_sharding(mesh) if mesh is not None else None
    loader = PrefetchLoader(pairs, batch_size=batch_size, prefetch=prefetch,
                            gray=True, sharding=sharding)
    step = jax.jit(lambda a, b: dense_batch_step(a, b, Q, cfg, mesh))
    outputs: List[str] = []
    idx = 0
    for left, right in loader:
        disp, pts, valid = step(left, right)
        disp_h = np.asarray(disp)
        pts_h = np.asarray(pts)
        valid_h = np.asarray(valid)
        for i in range(disp_h.shape[0]):
            mask = valid_h[i] & np.isfinite(pts_h[i]).all(-1) & (disp_h[i] > 0)
            path = os.path.join(out_dir, f"cloud_{idx:04d}.ply")
            PLY.write_ply(path, pts_h[i][mask])
            outputs.append(path)
            idx += 1
    return outputs
