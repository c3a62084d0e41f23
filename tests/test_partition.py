"""Row-partitioned (tensor-parallel) propagation tests on the 8-dev mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from canopy_tpu.compiler.graph import compile_gates
from canopy_tpu.engine.propagate import top_event_probability
from canopy_tpu.parallel.mesh import make_mesh
from canopy_tpu.parallel.partition import make_partitioned_propagator
from canopy_tpu.utils.synthetic import synthetic_mef_tree


def build(seed, **kw):
    top, events = synthetic_mef_tree(seed=seed, **kw)
    tree = compile_gates([top])
    tree.top_index = tree.gate_index[top.id]
    return tree


class TestPartitionedPropagation:
    @pytest.mark.parametrize("seed", [5, 6, 7])
    def test_matches_single_device(self, seed):
        tree = build(seed, n_basic=40, n_gates=35, fanin=3)
        mesh = make_mesh()
        propagate = make_partitioned_propagator(tree, mesh)
        batch = jnp.asarray(np.random.default_rng(seed).uniform(
            0, 0.3, (32, tree.n_basic)))
        house = jnp.asarray(tree.house_state_vector())
        got = propagate(batch, house)
        expected = top_event_probability(tree, batch, house)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-12)

    def test_model_parallel_only_mesh(self):
        """All devices on the model axis (pure TP)."""
        tree = build(11, n_basic=30, n_gates=25, fanin=3)
        mesh = make_mesh(model_parallelism=8)
        propagate = make_partitioned_propagator(tree, mesh)
        batch = jnp.asarray(np.random.default_rng(1).uniform(
            0, 0.2, (8, tree.n_basic)))
        house = jnp.asarray(tree.house_state_vector())
        got = propagate(batch, house)
        expected = top_event_probability(tree, batch, house)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-12)

    def test_determinism_across_layouts(self):
        """Same inputs give identical results for 2-way and 4-way TP."""
        tree = build(12, n_basic=36, n_gates=30, fanin=3)
        batch = jnp.asarray(np.random.default_rng(2).uniform(
            0, 0.2, (16, tree.n_basic)))
        house = jnp.asarray(tree.house_state_vector())
        results = []
        for tp in (2, 4):
            mesh = make_mesh(model_parallelism=tp)
            propagate = make_partitioned_propagator(tree, mesh)
            results.append(np.asarray(propagate(batch, house)))
        np.testing.assert_array_equal(results[0], results[1])
