"""Warm the persistent XLA compile cache for the benchmark suite
(VERDICT r3 item 1d).

Every distinct compiled program pays a ~60-500 s remote-relay compile on
the dev TPU (r4 measurements: XFeat init 63 s, the 960x536 forward 498 s);
`/root/.jax_cache` persists across processes, so running the suite once
in-round means the driver's `python bench.py` run pays execution, not
compilation.

This tool simply runs the full suite end to end — the cache key is the
HLO itself, so the only way to warm EXACTLY the programs the driver will
compile is to execute the same code. A generous budget override keeps the
per-config alarms from cutting warming short.

Usage: python tools/warm_bench_cache.py [configs...]
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")))


def main(argv):
    os.environ.setdefault("STEREO_BENCH_BUDGET_S", "86400")
    from stereo_reconstruction_cv_tpu import benchmarks

    # Disable the per-config alarms for warming: a cold compile may
    # legitimately exceed the driver-run caps.
    benchmarks._CAPS = {k: 86400 for k in benchmarks._CAPS}
    return benchmarks.main(argv or None)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
