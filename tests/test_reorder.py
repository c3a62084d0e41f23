"""Locality reordering pass: invariants, exactness, fill recovery."""

import jax.numpy as jnp
import numpy as np
import pytest

from canopy_tpu.compiler.graph import compile_gates
from canopy_tpu.compiler.reorder import (apply_permutation, locality_reorder,
                                         random_shuffle)
from canopy_tpu.engine.propagate import top_event_probability
from canopy_tpu.ops.bsr_propagate import compile_bsr
from canopy_tpu.utils.synthetic import (synthetic_compiled_tree,
                                        synthetic_hierarchical_tree,
                                        synthetic_mef_tree)


def _invariants(tree):
    """Engine invariants: per-block contiguous output ranges, level
    ranges unchanged, slot layout [basic | house | gates]."""
    seen = set()
    for level in tree.levels:
        for _, block in level.iter_blocks():
            if not block.n_gates:
                continue
            out = np.asarray(block.out_idx)
            assert (np.diff(out) == 1).all()
            assert out[0] >= tree.n_basic + tree.n_house
            assert not (set(out.tolist()) & seen)
            seen.update(out.tolist())
    assert len(seen) == tree.n_gates


def test_shuffle_then_reorder_hierarchical_fill():
    """A shuffled hierarchical tree (worst-case slot assignment of a
    structured model) recovers near-original BSR fill after reordering."""
    tree = synthetic_hierarchical_tree(n_basic=4096, branching=4,
                                       share_fraction=0.05, n_shared=64,
                                       seed=0)
    fill_orig = compile_bsr(tree).fill_ratio
    shuffled = random_shuffle(tree, seed=1).tree
    _invariants(shuffled)
    fill_shuf = compile_bsr(shuffled).fill_ratio
    recovered = locality_reorder(shuffled).tree
    _invariants(recovered)
    fill_rec = compile_bsr(recovered).fill_ratio
    # The shuffle must have destroyed locality and the first-use pass
    # must recover nearly all of it.
    assert fill_shuf > 4 * fill_orig
    assert fill_rec < 1.5 * fill_orig


def test_estimate_matches_compile():
    from canopy_tpu.ops.bsr_propagate import estimate_bsr_fill

    tree = synthetic_hierarchical_tree(n_basic=2048, branching=4,
                                       share_fraction=0.1, n_shared=64,
                                       seed=3)
    assert estimate_bsr_fill(tree) == pytest.approx(
        compile_bsr(tree).fill_ratio)


def test_auto_method_picks_no_worse():
    from canopy_tpu.ops.bsr_propagate import estimate_bsr_fill

    tree = random_shuffle(synthetic_hierarchical_tree(
        n_basic=2048, branching=4, share_fraction=0.05, n_shared=64,
        seed=4), seed=5).tree
    fills = {m: estimate_bsr_fill(locality_reorder(tree, method=m).tree)
             for m in ("first_use", "rcm", "auto")}
    assert fills["auto"] <= min(fills["first_use"], fills["rcm"]) + 1e-9


def test_reorder_bit_identical_synthetic():
    tree = synthetic_compiled_tree(n_basic=256, n_gates=2048, fanin=4,
                                   n_levels=6, seed=0)
    rng = np.random.default_rng(0)
    basic_p = rng.uniform(0.0, 0.3, (8, tree.n_basic))
    base = np.asarray(top_event_probability(
        tree, jnp.asarray(basic_p), jnp.zeros((0,))))

    for reordered in (random_shuffle(tree, seed=2),
                      locality_reorder(tree)):
        _invariants(reordered.tree)
        mapped = reordered.permute_basic(basic_p)
        got = np.asarray(top_event_probability(
            reordered.tree, jnp.asarray(mapped), jnp.zeros((0,))))
        # Same multiplies in the same order: bit-identical.
        np.testing.assert_array_equal(got, base)


def test_reorder_mef_tree_all_families():
    """Exactness through prod + pair + count families and the id maps."""
    top, events = synthetic_mef_tree(n_basic=64, n_gates=48, fanin=4,
                                     seed=5, atleast_fraction=0.3)
    tree = compile_gates([top])
    tree.top_index = tree.gate_index[top.id]
    reordered = locality_reorder(tree)
    new_tree = reordered.tree
    _invariants(new_tree)
    assert new_tree.top_index == int(reordered.perm[tree.top_index])

    p_by_id = {e.id: e.p() for e in events if e.id in tree.basic_index}
    vec_old = np.zeros(tree.n_basic)
    for name, slot in tree.basic_index.items():
        vec_old[slot] = p_by_id[name]
    vec_new = np.zeros(new_tree.n_basic)
    for name, slot in new_tree.basic_index.items():
        vec_new[slot] = p_by_id[name]
    # The index maps and the permutation agree.
    np.testing.assert_array_equal(reordered.permute_basic(vec_old), vec_new)

    base = float(top_event_probability(tree, jnp.asarray(vec_old),
                                       jnp.zeros((0,))))
    got = float(top_event_probability(new_tree, jnp.asarray(vec_new),
                                      jnp.zeros((0,))))
    assert got == base
    # Slot-ordered event lists stay consistent with the index map.
    for i, event in enumerate(new_tree.basic_events):
        assert new_tree.basic_index[event.id] == i
    for i, gate in enumerate(new_tree.gates):
        assert new_tree.gate_index[gate.id] == \
            new_tree.n_basic + new_tree.n_house + i


def test_apply_permutation_rejects_cross_block_moves():
    tree = synthetic_compiled_tree(n_basic=64, n_gates=128, fanin=3,
                                   n_levels=4, seed=1)
    perm = np.arange(tree.n_nodes)
    # Swap a gate of the first level with one of the last level.
    a = int(tree.levels[0].prods[0].out_idx[0])
    b = int(tree.levels[-1].prods[0].out_idx[0])
    perm[a], perm[b] = perm[b], perm[a]
    with pytest.raises(ValueError):
        apply_permutation(tree, perm)
