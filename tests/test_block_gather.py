"""Block-gather kernel: interpret-mode correctness + compile fallbacks."""

import jax.numpy as jnp
import numpy as np
import pytest

from canopy_tpu.compiler.graph import compile_gates
from canopy_tpu.compiler.reorder import locality_reorder, random_shuffle
from canopy_tpu.engine.propagate import top_event_probability
from canopy_tpu.errors import LogicError
from canopy_tpu.ops.block_gather import (block_gather_propagate,
                                         block_gather_supported,
                                         compile_block_gather)
from canopy_tpu.utils.synthetic import (synthetic_compiled_tree,
                                        synthetic_hierarchical_tree,
                                        synthetic_mef_tree)


def _reordered_hier(n_basic=4096, branching=8, share=0.1):
    shuffled = random_shuffle(synthetic_hierarchical_tree(
        n_basic=n_basic, branching=branching, share_fraction=share,
        n_shared=128, seed=0), seed=1).tree
    return locality_reorder(shuffled, hot_first=True).tree


def test_matches_gather_engine():
    tree = _reordered_hier()
    program = compile_block_gather(tree)
    rng = np.random.default_rng(0)
    p = rng.uniform(0.0, 0.4, (128, tree.n_basic)).astype(np.float32)
    got = np.asarray(block_gather_propagate(
        program, jnp.asarray(p), t_tile=128, interpret=True))
    ref = np.asarray(top_event_probability(
        tree, jnp.asarray(p), jnp.zeros((0,))))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_hard_zero_one_inputs_exact():
    tree = _reordered_hier(n_basic=1024, share=0.0)
    program = compile_block_gather(tree)
    rng = np.random.default_rng(1)
    p = (rng.random((128, tree.n_basic)) < 0.5).astype(np.float32)
    got = np.asarray(block_gather_propagate(
        program, jnp.asarray(p), t_tile=128, interpret=True))
    ref = np.asarray(top_event_probability(
        tree, jnp.asarray(p), jnp.zeros((0,))))
    # Log clamp keeps hard 0/1 exact.
    np.testing.assert_array_equal(got, ref)


def test_trials_tiling():
    tree = _reordered_hier(n_basic=1024)
    program = compile_block_gather(tree)
    rng = np.random.default_rng(2)
    p = rng.uniform(0.0, 0.2, (512, tree.n_basic)).astype(np.float32)
    got = np.asarray(block_gather_propagate(
        program, jnp.asarray(p), t_tile=128, interpret=True))
    ref = np.asarray(top_event_probability(
        tree, jnp.asarray(p), jnp.zeros((0,))))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_unstructured_tree_falls_back():
    # Uniform-random argument structure has no recoverable locality:
    # the compile must refuse rather than emit giant DMA windows.
    tree = synthetic_compiled_tree(n_basic=8192, n_gates=60_000, fanin=4,
                                   n_levels=10, seed=0)
    tree = locality_reorder(tree, hot_first=True).tree
    with pytest.raises(LogicError):
        compile_block_gather(tree, r_max=2048)


def test_supported_predicate():
    top, _ = synthetic_mef_tree(n_basic=32, n_gates=24,
                                atleast_fraction=0.5, seed=1)
    tree = compile_gates([top])
    tree.top_index = tree.gate_index[top.id]
    assert not block_gather_supported(tree)  # count gates
    prod_tree = _reordered_hier(n_basic=512)
    assert block_gather_supported(prod_tree)


def test_bad_trial_count():
    tree = _reordered_hier(n_basic=512)
    program = compile_block_gather(tree)
    with pytest.raises(LogicError):
        block_gather_propagate(program, jnp.zeros((100, tree.n_basic)),
                               interpret=True)


def test_direct_mode_bit_exact_vs_gather():
    """The direct-space kernel (per-fan one-hot copy matmuls + VPU
    product, no log/exp) matches the gather engine bit-for-bit in
    interpret mode — the selection matmul is a 0/1 copy."""
    tree = _reordered_hier()
    program = compile_block_gather(tree)
    rng = np.random.default_rng(3)
    p = rng.uniform(0.0, 0.9, (128, tree.n_basic)).astype(np.float32)
    got = np.asarray(block_gather_propagate(
        program, jnp.asarray(p), t_tile=128, interpret=True,
        mode="direct"))
    ref = np.asarray(top_event_probability(
        tree, jnp.asarray(p), jnp.zeros((0,))), np.float32)
    np.testing.assert_array_equal(got, ref)
