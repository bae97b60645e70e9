"""Benchmark driver shim — the suite lives in the package (cli `bench`).

Runs all five BASELINE.json configs; one JSON line per config, with the
headline metric (720p full 8-path SGBM, 128 disparities — same metric name
since round 1) printed LAST:
  {"metric": "sgbm_disparity_720p_128disp", "value": N, "unit": "MPix/s",
   "vs_baseline": N}
vs_baseline is the speedup over cv2 (same parameters) on this host's CPU.
Restrict configs with STEREO_BENCH_CONFIGS=2 (comma-separated) or argv.
"""

import sys

from stereo_reconstruction_cv_tpu import benchmarks

if __name__ == "__main__":
    sys.exit(benchmarks.main(sys.argv[1:] or None))
