"""Window-size / marginalization sweep on the noisy-IMU corkscrew harness.

Produces the fidelity-vs-window evidence requested after round 1 (VERDICT
r1 weak #2): runs tests/test_lio.py::_run_corkscrew_with_noise at
window_size in {4, 6, 16, 32} with soft head anchoring AND with
EXACT_MARGINALIZATION, printing one JSON line per run. Record results in
PARITY.md.

The REFERENCE-FAITHFUL row (VERDICT r2 #8): the reference's ISAM2 graph
GROWS until `num_range_data` (100) keys, then resets with the last state
carried as priors (local_trajectory_builder_3d.cc:750-797). For a
sequence shorter than 100 scans, that is exactly a window that never
drops a key — window_size >= sequence length (the corkscrew is 18 scans),
so the `reference_equivalent` row measures the 100-key ISAM2 behavior
itself, not an approximation of it.

Usage: JAX_PLATFORMS=cpu PYTHONPATH=. python tools/window_sweep.py
"""

import json
import sys

sys.path.insert(0, ".")

from dliom_tpu.io.synthetic import corkscrew_trajectory  # noqa: E402
from tests.test_lio import _run_corkscrew_with_noise  # noqa: E402


def main():
    seq_len = len(corkscrew_trajectory())
    for exact in (False, True):
        for w in (4, 6, 16, seq_len, 32):
            t_err, r_err, bias_err, failed = _run_corkscrew_with_noise(
                window_size=w, exact_marginalization=exact
            )
            print(
                json.dumps(
                    {
                        "window_size": w,
                        # window >= sequence: no key ever dropped == the
                        # reference's growing graph between resets
                        "reference_equivalent": w >= seq_len,
                        "exact_marginalization": exact,
                        "max_t_err_m": round(t_err, 4),
                        "max_r_err_rad": round(r_err, 4),
                        "bias_err": round(bias_err, 4),
                        "failed": failed,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
