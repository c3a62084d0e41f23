"""Bit-packed Boolean engine vs the float propagation engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from canopy_tpu.compiler.graph import compile_gates
from canopy_tpu.engine.propagate import propagate_probability
from canopy_tpu.mef.event import Arg, BasicEvent, Connective, Formula, Gate
from canopy_tpu.mef.expr import ConstantExpression
from canopy_tpu.ops.bitpack import (pack_states, packed_top_probability,
                                    popcount_mean, propagate_packed,
                                    sample_states_packed)


def make_events(probs):
    events = []
    for i, p in enumerate(probs):
        e = BasicEvent(f"e{i}")
        e.expression = ConstantExpression(p)
        events.append(e)
    return events


def build_mixed_tree():
    """A tree exercising every gate family, with complements."""
    events = make_events([0.2, 0.4, 0.6, 0.3, 0.5, 0.7])
    g_and = Gate("g_and")
    g_and.formula = Formula(Connective.AND,
                            [Arg(events[0]), Arg(events[1], True)])
    g_or = Gate("g_or")
    g_or.formula = Formula(Connective.OR, [Arg(events[2]), Arg(events[3])])
    g_xor = Gate("g_xor")
    g_xor.formula = Formula(Connective.XOR, [Arg(g_and), Arg(events[4])])
    g_atl = Gate("g_atl")
    g_atl.formula = Formula(Connective.ATLEAST,
                            [Arg(events[1]), Arg(events[2], True),
                             Arg(events[4]), Arg(events[5])], min_number=2)
    g_card = Gate("g_card")
    g_card.formula = Formula(Connective.CARDINALITY,
                             [Arg(events[0]), Arg(events[3]),
                              Arg(events[5])], min_number=1, max_number=2)
    top = Gate("top")
    top.formula = Formula(Connective.OR,
                          [Arg(g_xor), Arg(g_atl, True), Arg(g_card)])
    tree = compile_gates([top])
    tree.top_index = tree.gate_index["top"]
    return tree


class TestPacking:
    def test_pack_round_trip(self):
        rng = np.random.default_rng(0)
        states = (rng.random((64, 5)) < 0.5).astype(np.float64)
        packed = pack_states(jnp.asarray(states))
        assert packed.shape == (5, 2)
        # Unpack and compare.
        unpacked = np.zeros((64, 5))
        packed_np = np.asarray(packed)
        for t in range(64):
            for n in range(5):
                unpacked[t, n] = (packed_np[n, t // 32] >> (t % 32)) & 1
        np.testing.assert_array_equal(unpacked, states)

    def test_sampler_matches_probabilities(self):
        p = jnp.asarray([0.1, 0.5, 0.9])
        packed = sample_states_packed(jax.random.PRNGKey(0), p, 32 * 4096)
        freq = np.asarray(popcount_mean(packed, 32 * 4096))
        np.testing.assert_allclose(freq, np.asarray(p), atol=0.01)


class TestPackedPropagation:
    def test_exact_match_with_float_engine(self):
        """Same Boolean states through both engines give identical bits."""
        tree = build_mixed_tree()
        rng = np.random.default_rng(42)
        n_trials = 128
        states = (rng.random((n_trials, tree.n_basic)) < 0.5).astype(
            np.float64)
        # Float engine: propagate 0/1 states.
        float_vals = propagate_probability(
            tree, jnp.asarray(states), jnp.zeros((tree.n_house,)))
        # Packed engine.
        packed = pack_states(jnp.asarray(states))
        packed_vals = propagate_packed(tree, packed,
                                       jnp.zeros((tree.n_house,)))
        # Compare every node's bits.
        packed_np = np.asarray(packed_vals)
        float_np = np.asarray(float_vals)
        for node in range(tree.n_nodes):
            for t in range(n_trials):
                bit = (packed_np[node, t // 32] >> (t % 32)) & 1
                assert bit == int(float_np[t, node]), (node, t)

    def test_estimate_converges(self):
        tree = build_mixed_tree()
        p = jnp.asarray([0.2, 0.4, 0.6, 0.3, 0.5, 0.7])
        est = float(packed_top_probability(
            tree, jax.random.PRNGKey(3), p, 32 * 8192))
        from helpers import brute_force_probability
        top = next(g for g in tree.gates if g.id == "top")
        exact = brute_force_probability(top, tree.basic_events)
        assert abs(est - exact) < 0.01

    def test_house_events(self):
        events = make_events([0.5])
        h = __import__("canopy_tpu.mef.event", fromlist=["HouseEvent"]) \
            .HouseEvent("h", state=True)
        top = Gate("top")
        top.formula = Formula(Connective.AND, [Arg(events[0]), Arg(h)])
        tree = compile_gates([top])
        tree.top_index = tree.gate_index["top"]
        p = jnp.asarray([1.0])
        on = float(packed_top_probability(
            tree, jax.random.PRNGKey(0), p, 64,
            house_states=jnp.asarray([1.0])))
        off = float(packed_top_probability(
            tree, jax.random.PRNGKey(0), p, 64,
            house_states=jnp.asarray([0.0])))
        assert on == 1.0 and off == 0.0
