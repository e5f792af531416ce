"""A/B the canon window width (DH_CANON_LAG) at the char config.

The canon step's per-step cache traffic splits into a position-dependent
shared-prefix stream (~7 us/position measured) and a position-INDEPENDENT
floor dominated by the per-row window reads (w = lag columns per row per
layer). Shrinking the lag cuts the floor but moves the coalescence check
closer to the write head, raising the straggler fraction (stragglers pay
a full-width recompute). This driver runs benchmarks/canon_char_ab in a
subprocess per lag value (the knob is import-time; the generation
executable cache does not key on it) and reports canon-on throughput per
lag. Exactness at any lag is covered by
tests/test_pallas_attention.py::test_generation_canon_equality_alternate_lag.

Run: python -m benchmarks.canon_lag_ab
"""

import os
import re
import subprocess
import sys


def main():
    results = {}
    for lag in (16, 24, 32):
        env = dict(os.environ, DH_CANON_LAG=str(lag))
        proc = subprocess.run(
            [sys.executable, "-m", "benchmarks.canon_char_ab"],
            env=env, capture_output=True, text=True, timeout=1500)
        if proc.returncode != 0:
            print(f"lag={lag}: FAILED\n{proc.stderr[-500:]}", flush=True)
            continue
        m = re.search(r"canon=True:\s*([\d.]+) captions/s", proc.stdout)
        m0 = re.search(r"canon=False:\s*([\d.]+) captions/s", proc.stdout)
        results[lag] = (float(m.group(1)) if m else None,
                        float(m0.group(1)) if m0 else None)
        print(f"lag={lag}: canon={results[lag][0]} capt/s "
              f"(full-width control {results[lag][1]})", flush=True)
    if results:
        best = max(results, key=lambda k: results[k][0] or 0)
        print(f"best lag: {best} ({results[best][0]} capt/s)")


if __name__ == "__main__":
    main()
