import sys, time, contextlib
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from stereo_reconstruction_cv_tpu.pipeline import stages

# Bypass the host-CPU blanket: run all geometry solves on the TPU.
stages._on_host_cpu = contextlib.nullcontext
K = np.array([[2253.71, 0, 1929.69], [0, 2244.72, 1057.63], [0, 0, 1.0]])
t0 = time.perf_counter()
out = stages.estimate_geometry("/root/reference/dataset/d3", baseline=0.14, camera_matrix=K)
print("wall", round(time.perf_counter()-t0, 1), "s")
R = out["Rotation Matrix"]; T = out["Translation Vector"].ravel()
print("R=\n", np.round(R, 4))
print("T=", np.round(T, 4))
print("matches", out["num_matches"], "F inl", out["num_inliers_F"], "E inl", out["num_inliers_E"])
offdiag = np.abs(R - np.eye(3)).max()
Tn = T / np.linalg.norm(T)
anchor = np.array([1.0, 0.00964, -0.00387])
err = min(np.linalg.norm(Tn - anchor), np.linalg.norm(Tn + anchor))
print("max|R-I|:", round(float(offdiag), 4), " T dir err:", round(float(err), 4))
assert offdiag < 0.08 and err < 0.05, "anchor check failed"
print("GEOM TPU OK")
