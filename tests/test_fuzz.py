"""Always-on mini fuzz: a few randomized end-to-end configs through the
full pipeline, byte-compared against the oracle -- the CI-sized slice of
``native/fuzz_sweep.py`` (which runs 30+ configs + driver-mode
combinations as run-once evidence).  Seeded, so failures reproduce."""

import numpy as np

from native.fuzz_sweep import one_config, one_mode_config


def test_mini_fuzz(tmp_path):
    rng = np.random.default_rng(424242)
    for i in range(3):
        one_config(rng, str(tmp_path), i)


def test_mini_mode_fuzz(tmp_path):
    rng = np.random.default_rng(515151)
    one_mode_config(rng, str(tmp_path), 0)
