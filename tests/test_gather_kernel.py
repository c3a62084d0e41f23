"""DMA-pipelined gather kernel tests (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from canopy_tpu.engine.propagate import top_event_probability
from canopy_tpu.ops.gather_kernel import gather_propagate, gather_supported
from canopy_tpu.utils.synthetic import synthetic_compiled_tree


class TestGatherKernel:
    def test_matches_xla_engine(self):
        tree = synthetic_compiled_tree(n_basic=256, n_gates=1000, fanin=4,
                                       n_levels=6, seed=3)
        assert gather_supported(tree)
        batch = jnp.asarray(np.random.default_rng(0).uniform(
            0, 0.9, (1024, tree.n_basic)), dtype=jnp.float32)
        got = np.asarray(gather_propagate(tree, batch, interpret=True))
        expected = np.asarray(top_event_probability(tree, batch))
        np.testing.assert_array_equal(got, expected)

    def test_partial_tile(self):
        """Gate counts not divisible by the tile size."""
        tree = synthetic_compiled_tree(n_basic=64, n_gates=77, fanin=3,
                                       n_levels=4, seed=5)
        batch = jnp.asarray(np.random.default_rng(1).uniform(
            0, 1, (1024, tree.n_basic)), dtype=jnp.float32)
        got = np.asarray(gather_propagate(tree, batch, interpret=True))
        expected = np.asarray(top_event_probability(tree, batch))
        np.testing.assert_array_equal(got, expected)

    def test_trials_alignment_required(self):
        tree = synthetic_compiled_tree(n_basic=64, n_gates=77, fanin=3,
                                       n_levels=4, seed=5)
        with pytest.raises(AssertionError):
            gather_propagate(tree, jnp.zeros((100, 64)), interpret=True)
