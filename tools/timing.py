"""Back-compat shim: the chained-timing harness moved into the package
(stereo_reconstruction_cv_tpu.utils.timing) so benchmarks.py can use it."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from stereo_reconstruction_cv_tpu.utils.timing import rtt, timed_chain  # noqa: F401
