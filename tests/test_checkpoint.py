"""Checkpoint/resume determinism tests."""

import numpy as np
import pytest

from canopy_tpu.engine.checkpoint import CheckpointedSweep, SweepState


def batch_fn(key, batch_index):
    import jax
    return np.asarray(jax.random.uniform(key, (64,)))


class TestCheckpointedSweep:
    def test_resume_is_bit_identical(self, tmp_path):
        path = str(tmp_path / "sweep.npz")
        # Uninterrupted run.
        full = CheckpointedSweep(batch_fn, seed=5, n_batches=6,
                                 batch_trials=64).run()
        # Interrupted: run 3 batches, then resume from checkpoint.
        first = CheckpointedSweep(batch_fn, seed=5, n_batches=3,
                                  batch_trials=64,
                                  checkpoint_path=path)
        first.run()
        resumed = CheckpointedSweep(batch_fn, seed=5, n_batches=6,
                                    batch_trials=64,
                                    checkpoint_path=path).run()
        assert resumed.completed_trials == full.completed_trials == 384
        assert resumed.sum_ == full.sum_
        assert resumed.sum_sq == full.sum_sq
        np.testing.assert_array_equal(resumed.reservoir, full.reservoir)

    def test_seed_mismatch_rejected(self, tmp_path):
        path = str(tmp_path / "sweep.npz")
        CheckpointedSweep(batch_fn, seed=1, n_batches=1, batch_trials=64,
                          checkpoint_path=path).run()
        with pytest.raises(ValueError):
            CheckpointedSweep(batch_fn, seed=2, n_batches=2,
                              batch_trials=64, checkpoint_path=path)

    def test_statistics(self):
        state = CheckpointedSweep(batch_fn, seed=0, n_batches=50,
                                  batch_trials=64).run()
        assert abs(state.mean - 0.5) < 0.02
        assert abs(state.std - np.sqrt(1 / 12)) < 0.02
        q = state.quantiles([0.1, 0.5, 0.9])
        assert abs(q[1] - 0.5) < 0.05

    def test_atomic_save_load(self, tmp_path):
        path = str(tmp_path / "s.npz")
        state = SweepState.fresh(seed=9)
        state.sum_ = 1.25
        state.completed_trials = 10
        state.save(path)
        loaded = SweepState.load(path)
        assert loaded.seed == 9
        assert loaded.sum_ == 1.25
        assert loaded.completed_trials == 10
