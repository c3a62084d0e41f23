"""Pipeline parallelism over gate levels: equivalence + stage planning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from canopy_tpu.parallel.pipeline import (make_pipe_mesh,
                                          make_pipeline_propagator,
                                          plan_stages)
from canopy_tpu.engine.propagate import top_event_probability
from canopy_tpu.utils.synthetic import (synthetic_compiled_tree,
                                        synthetic_hierarchical_tree)


def _reference(tree, basic_p):
    return np.asarray(top_event_probability(
        tree, jnp.asarray(basic_p), jnp.zeros((0,))))


@pytest.mark.parametrize("pipe,data", [(4, 1), (8, 1), (4, 2)])
def test_pipeline_matches_single_device(pipe, data):
    tree = synthetic_compiled_tree(n_basic=128, n_gates=512, fanin=3,
                                   n_levels=9, seed=0)
    mesh = make_pipe_mesh(jax.devices()[:pipe * data], pipe=pipe,
                          data=data)
    n_micro = 2 * pipe
    n_trials = data * n_micro * 4
    rng = np.random.default_rng(0)
    basic_p = rng.uniform(0.0, 0.4, (n_trials, tree.n_basic)) \
        .astype(np.float32)
    fn = make_pipeline_propagator(tree, mesh, n_micro=n_micro)
    got = np.asarray(fn(jnp.asarray(basic_p), jnp.zeros((0,))))
    # Same multiplies in the same order per microbatch: bit-identical.
    np.testing.assert_array_equal(got, _reference(tree, basic_p))


def test_pipeline_deep_tree_more_stages_than_levels_per_stage():
    tree = synthetic_hierarchical_tree(n_basic=256, branching=2, seed=1)
    mesh = make_pipe_mesh(jax.devices()[:8], pipe=8)
    fn = make_pipeline_propagator(tree, mesh, n_micro=8)
    rng = np.random.default_rng(1)
    basic_p = rng.uniform(0.0, 0.3, (16, tree.n_basic)).astype(np.float32)
    got = np.asarray(fn(jnp.asarray(basic_p), jnp.zeros((0,))))
    np.testing.assert_array_equal(got, _reference(tree, basic_p))


def test_plan_stages_balanced_and_contiguous():
    tree = synthetic_compiled_tree(n_basic=512, n_gates=4096, fanin=4,
                                   n_levels=10, seed=2)
    stages = plan_stages(tree, 4)
    assert len(stages) == 4
    # Contiguous coverage of all levels, in order.
    starts = [c.out_start for chunk in stages for c in chunk]
    assert starts == sorted(starts)
    total = sum(c.nnz for chunk in stages for c in chunk)
    assert total == tree.nnz
    # No stage exceeds ~2x the ideal share (first level dominates, so
    # the bound is loose but bounded).
    assert max(sum(c.nnz for c in chunk) for chunk in stages) \
        <= 0.95 * total


def test_pipeline_rejects_bad_microbatching():
    tree = synthetic_compiled_tree(n_basic=64, n_gates=128, fanin=3,
                                   n_levels=4, seed=3)
    mesh = make_pipe_mesh(jax.devices()[:4], pipe=4)
    fn = make_pipeline_propagator(tree, mesh, n_micro=8)
    bad = jnp.zeros((12, tree.n_basic))  # 12 % 8 != 0
    with pytest.raises(Exception):
        fn(bad, jnp.zeros((0,)))
