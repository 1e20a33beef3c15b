"""bench.py result-integrity guards (VERDICT r3 item 1).

Round 3 recorded a physically impossible 153x "speedup" when a PJRT tunnel
transient returned from ``block_until_ready`` without a real device
round-trip.  These tests pin the guards that make such a run fail loudly
instead of poisoning BENCH_HISTORY.json.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_spread_guard_accepts_stable_timings():
    assert bench.check_spread([0.250, 0.252, 0.255]) is None


def test_spread_guard_rejects_wild_disagreement():
    # One 1.6 ms outlier among 250 ms runs (the r3 incident shape).
    assert bench.check_spread([0.0016, 0.250, 0.252]) is not None


def test_flops_guard_accepts_real_rate():
    # Real r2/r3 headline: 24.7M segments in 0.250 s over 512 padded
    # spheres => ~5e11 implied FLOP/s, well under the VPU ceiling.
    assert bench.check_flops(24_700_000, 512, 0.250) is None


def test_flops_guard_rejects_r3_artifact():
    # The recorded artifact: same segments in 1.6 ms => ~8e16 FLOP/s.
    err = bench.check_flops(24_700_000, 512, 0.0016)
    assert err is not None and "impossible" in err


def test_flops_guard_ignores_zero_segments():
    # Modes that don't count segments must not trip the guard.
    assert bench.check_flops(0, 512, 0.001) is None


def test_checksum_guard():
    assert bench.check_checksum(100.0, 100.4) is None  # ulp-drift scale
    assert bench.check_checksum(0.0, 100.0) is not None  # no-op execution
    assert bench.check_checksum(57.0, 100.0) is not None  # wrong image
