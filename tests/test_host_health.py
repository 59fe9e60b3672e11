"""Smoke for tools/host_health.py (embedded import path + sane output)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_first_touch_probe_runs():
    from host_health import first_touch_gbps
    g = first_touch_gbps(n_procs=2, seconds=0.3)
    # any real host measures somewhere between "badly degraded" and
    # "all-cache"; the probe must return a positive finite rate
    assert 0.01 < g < 10_000
