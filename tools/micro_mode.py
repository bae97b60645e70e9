"""Time sgbm_disparity by mode/shape on the real chip (tools/).

Usage: python tools/micro_mode.py 720p:5 4k:8 ...   (name:num_directions)
Feeds the mode-split table in docs/ROOFLINE.md.
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from stereo_reconstruction_cv_tpu.config import SGBMConfig
from stereo_reconstruction_cv_tpu.ops.disparity import sgbm_disparity_auto
from stereo_reconstruction_cv_tpu.utils.timing import timed_chain
from stereo_reconstruction_cv_tpu import benchmarks as B

jobs = []
for a in sys.argv[1:]:
    name, nd = a.split(":")
    jobs.append((name, int(nd)))
for name, nd in jobs:
    shape = (3840, 2160) if name == "4k" else (1280, 720)
    iters = 3 if name == "4k" else 5
    imL, imR = B._load_pair("d3" if name == "4k" else "d2", shape)
    # Match bench_config3's cfg128 exactly (ADVICE r3): speckle off, and
    # the _auto entry point so the off-TPU row-tiling fallback engages.
    cfg = SGBMConfig(num_disparities=128, num_directions=nd,
                     speckle_window_size=0)
    step = lambda l, r: jnp.sum(sgbm_disparity_auto(l, r, cfg)[0])
    dt = timed_chain(step, (jnp.asarray(imL), jnp.asarray(imR)), iters=iters)
    mpix = imL.shape[0]*imL.shape[1]/1e6
    print(f"{name} {nd}dir: {dt*1e3:.1f} ms  {mpix/dt:.1f} MPix/s", flush=True)
