import sys, os, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp, cv2
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
print(jax.devices(), flush=True)

from stereo_reconstruction_cv_tpu.config import SGBMConfig
from stereo_reconstruction_cv_tpu.ops import disparity as DP, rectify as RC, geometry as G
from stereo_reconstruction_cv_tpu.pipeline import stages
from stereo_reconstruction_cv_tpu.io import ply as PLY, viewer as VW

# d2 1080p pair -> calibrated-geometry rectify -> SGBM auto -> reproject -> exports
imL = cv2.imread("/root/reference/dataset/d2/img1.jpg", 0)
imR = cv2.imread("/root/reference/dataset/d2/img2.jpg", 0)
H, W = imL.shape
K = np.array([[2253.71, 0, 1929.69], [0, 2244.72, 1057.63], [0, 0, 1.0]]) * np.array([[W/3840]]*2 + [[1]])
K[0,0] *= 1; K = np.array([[2253.71*W/3840, 0, 1929.69*W/3840], [0, 2244.72*W/3840, 1057.63*W/3840], [0,0,1]])
geo = RC.stereo_rectify(jnp.asarray(K), None, jnp.asarray(K), None, (W, H),
                        jnp.asarray(np.eye(3)), jnp.asarray([-0.14, 0., 0.]), alpha=0.0)
Kj = jnp.asarray(K, jnp.float32)
rect = jax.jit(lambda a, R, P: RC.rectify_remap(a, Kj, None, R.astype(jnp.float32), P.astype(jnp.float32)))
rl = rect(jnp.asarray(imL), geo.R1, geo.P1)
rr = rect(jnp.asarray(imR), geo.R2, geo.P2)
cfg = SGBMConfig(num_disparities=64, num_directions=8)
disp, valid = DP.sgbm_disparity_host_speckle(rl, rr, cfg)
print("disp range", float(disp.min()), float(disp.max()), "valid frac", valid.mean(), flush=True)
pts = np.asarray(jax.jit(lambda d: G.reproject_image_to_3d(d, jnp.asarray(geo.Q, jnp.float32)))(jnp.asarray(disp)))
mask = valid & np.isfinite(pts).all(-1) & (disp > 0)
print("cloud points:", mask.sum(), flush=True)
n = PLY.write_ply("/tmp/drive_cloud.ply", pts[mask])
nv = VW.write_html_viewer("/tmp/drive_cloud.html", pts[mask], max_points=500_000)
print("ply", n, "viewer", nv, os.path.getsize("/tmp/drive_cloud.html")//1024, "KB", flush=True)
assert n > 100_000 and nv > 100_000

# exact speckle parity on this real pair (packaged API, jitted path)
core = cfg.with_(speckle_window_size=0)
d0, v0 = DP.sgbm_disparity(jnp.asarray(imL), jnp.asarray(imR), core)
d0 = np.asarray(d0); v0 = np.asarray(v0)
d16 = np.round(d0 * 16).astype(np.int16)
from stereo_reconstruction_cv_tpu import native
keep = native.filter_speckles(d16.astype(np.float32)/16.0, v0, 100, 32.0)
INV = np.int16(-16)
dcv = np.where(v0, d16, INV).astype(np.int16)
cv2.filterSpeckles(dcv, int(INV), 100, 16*32)
agree = np.mean(keep == (v0 & (dcv != INV)))
print("speckle exact agreement vs cv2:", agree, flush=True)
assert agree == 1.0
print("DRIVE OK", flush=True)
