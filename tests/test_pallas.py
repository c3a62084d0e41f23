"""Pallas kernel tests (interpret mode on the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from canopy_tpu.compiler.graph import compile_gates
from canopy_tpu.engine.propagate import top_event_probability
from canopy_tpu.mef.event import Arg, BasicEvent, Connective, Formula, Gate
from canopy_tpu.mef.expr import ConstantExpression
from canopy_tpu.ops.bitpack import popcount_mean
from canopy_tpu.ops.pallas_kernels import fused_propagate, packed_bernoulli


def build_tree():
    events = []
    for i, p in enumerate([0.1, 0.3, 0.5, 0.2, 0.4, 0.6, 0.25, 0.35]):
        e = BasicEvent(f"e{i}")
        e.expression = ConstantExpression(p)
        events.append(e)
    g1 = Gate("g1")
    g1.formula = Formula(Connective.AND, [Arg(events[0]), Arg(events[1])])
    g2 = Gate("g2")
    g2.formula = Formula(Connective.OR,
                         [Arg(events[2]), Arg(events[3], True)])
    g3 = Gate("g3")
    g3.formula = Formula(Connective.ATLEAST,
                         [Arg(events[4]), Arg(events[5]), Arg(events[6])],
                         min_number=2)
    g4 = Gate("g4")
    g4.formula = Formula(Connective.XOR, [Arg(g1), Arg(events[7])])
    top = Gate("top")
    top.formula = Formula(Connective.OR, [Arg(g2, True), Arg(g3), Arg(g4)])
    tree = compile_gates([top])
    tree.top_index = tree.gate_index["top"]
    return tree


_TPU = jax.default_backend() == "tpu"
needs_tpu_prng = pytest.mark.skipif(
    not _TPU, reason="the interpret-mode Pallas PRNG is a zero stub; "
    "statistical sampler tests need real TPU hardware")


class TestPackedBernoulli:
    @needs_tpu_prng
    def test_frequencies(self):
        p = jnp.asarray([0.05, 0.3, 0.5, 0.95])
        n_trials = 32 * 4096
        packed = packed_bernoulli(7, p, n_trials, interpret=True)
        assert packed.shape == (4, n_trials // 32)
        assert packed.dtype == jnp.uint32
        freq = np.asarray(popcount_mean(packed, n_trials))
        np.testing.assert_allclose(freq, np.asarray(p), atol=0.01)

    def test_degenerate_probabilities(self):
        p = jnp.asarray([0.0, 1.0])
        packed = packed_bernoulli(0, p, 64, interpret=True)
        packed_np = np.asarray(packed)
        assert (packed_np[0] == 0).all()
        assert (packed_np[1] == 0xFFFFFFFF).all()

    @needs_tpu_prng
    def test_deterministic_per_seed(self):
        p = jnp.asarray([0.4, 0.6, 0.2])
        a = packed_bernoulli(3, p, 128, interpret=True)
        b = packed_bernoulli(3, p, 128, interpret=True)
        c = packed_bernoulli(4, p, 128, interpret=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert (np.asarray(a) != np.asarray(c)).any()


class TestFusedPropagate:
    def test_matches_reference_engine(self):
        tree = build_tree()
        rng = np.random.default_rng(0)
        batch = jnp.asarray(rng.uniform(0, 1, (256, tree.n_basic)))
        got = fused_propagate(tree, batch, tree.house_state_vector(),
                              interpret=True)
        expected = top_event_probability(tree, batch.astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=2e-5)

    def test_boolean_inputs_exact(self):
        """0/1 inputs give exact Boolean outputs (no fp32 rounding)."""
        tree = build_tree()
        rng = np.random.default_rng(1)
        states = (rng.random((128, tree.n_basic)) < 0.5).astype(np.float64)
        got = fused_propagate(tree, jnp.asarray(states),
                              tree.house_state_vector(), interpret=True)
        expected = top_event_probability(tree, jnp.asarray(states))
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(expected))


class TestFusedPropagateTiled:
    def test_matches_plain_fused(self):
        from canopy_tpu.ops.pallas_kernels import fused_propagate_tiled

        tree = build_tree()
        rng = np.random.default_rng(2)
        batch = jnp.asarray(
            rng.uniform(0, 1, (1024, tree.n_basic)).astype(np.float32))
        got = fused_propagate_tiled(tree, batch,
                                    tree.house_state_vector(),
                                    interpret=True)
        expected = fused_propagate(tree, batch,
                                   tree.house_state_vector(),
                                   interpret=True)
        # Same multiplies, different tile shape: bit-identical.
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(expected))

    def test_rejects_ragged_trials(self):
        from canopy_tpu.ops.pallas_kernels import fused_propagate_tiled

        tree = build_tree()
        with pytest.raises(ValueError):
            fused_propagate_tiled(tree, jnp.zeros((500, tree.n_basic)),
                                  tree.house_state_vector(),
                                  interpret=True)


class TestFusedTiledStaged:
    def test_matches_unstaged(self):
        from canopy_tpu.ops.pallas_kernels import (
            fused_propagate_tiled, fused_propagate_tiled_staged,
            tile_trials)

        tree = build_tree()
        rng = np.random.default_rng(3)
        batch = jnp.asarray(
            rng.uniform(0, 1, (1024, tree.n_basic)), jnp.float32)
        house = tree.house_state_vector()
        a = fused_propagate_tiled(tree, batch, house, interpret=True)
        staged = tile_trials(batch)
        b = fused_propagate_tiled_staged(tree, staged, house,
                                         interpret=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
