import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax, cv2
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from stereo_reconstruction_cv_tpu.ops import disparity as DP
from stereo_reconstruction_cv_tpu import native

rng = np.random.default_rng(0)

def check(disp, valid, rounds, label):
    keep = np.asarray(DP.speckle_filter(jnp.asarray(disp), jnp.asarray(valid), 100, 32.0, rounds))
    ref = native.filter_speckles(disp, valid.copy(), 100, 32.0)
    agree = (keep == ref).mean()
    print(f"{label} rounds={rounds}: agree={agree:.6f}")
    return agree

# random blobs
H, W = 240, 320
disp = (rng.uniform(0, 64, (H, W))).astype(np.float32)
valid = rng.uniform(size=(H, W)) > 0.35
for r in (2, 4, 6):
    check(disp, valid, r, "random")

# real pair d2
imL = cv2.resize(cv2.imread("/root/reference/dataset/d2/img1.jpg", 0), (640, 360))
imR = cv2.resize(cv2.imread("/root/reference/dataset/d2/img2.jpg", 0), (640, 360))
from stereo_reconstruction_cv_tpu.config import SGBMConfig
cfg = SGBMConfig(num_disparities=64, speckle_window_size=0)
d, v = DP.sgbm_disparity(jnp.asarray(imL), jnp.asarray(imR), cfg)
d = np.asarray(d); v = np.asarray(v)
dq = (np.round(d*16).astype(np.int16).astype(np.float32))/16.0
for r in (2, 4, 6):
    check(dq, v, r, "d2")
