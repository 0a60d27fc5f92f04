"""Regression guard on the ONE property that makes this BLISS rather than
LADIES-on-TPU: the EXP3 arm-weight update measurably accelerates
convergence (bandit_sampler.py:195-249; paper claim).

Runs bench.py's honest time-to-val-F1 workload (PR1-style config on the
EXP3-sensitive synth-pubmed-hard stand-in, scripts/calibrate_ttvf1.py)
twice — live bandit vs ``exp3_freeze=True`` (sampling still consumes the
uniform arm weights; the update is never applied) — and asserts the frozen
arm needs >= 1.3x the steps to the target F1.  The frozen arm is capped
just past the ratio bound so an (expected) never-reaching run doesn't burn
CI time; calibrated behavior: live reaches in ~64 steps, frozen plateaus
below target indefinitely."""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_frozen_bandit_needs_more_steps():
    live = bench._bench_time_to_val_f1(max_chains=25)
    assert live["ttvf1_steps"] is not None, (
        f"live bandit never reached target: {live}"
    )
    K = bench.TTVF1_K  # bench chain length
    cap = math.ceil(1.3 * live["ttvf1_steps"] / K) + 1
    frozen = bench._bench_time_to_val_f1(max_chains=cap, freeze=True)
    if frozen["ttvf1_frozen_reached"]:
        assert (
            frozen["ttvf1_frozen_bandit_steps"] >= 1.3 * live["ttvf1_steps"]
        ), (live, frozen)
    else:
        # never reached within 1.3x the live budget — an even stronger gap
        assert frozen["ttvf1_frozen_bandit_steps"] >= 1.3 * live["ttvf1_steps"] - K, (
            live, frozen)
