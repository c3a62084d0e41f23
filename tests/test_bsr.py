"""BSR log-space engine vs the gather engine."""

import jax.numpy as jnp
import numpy as np
import pytest

from canopy_tpu.engine.propagate import top_event_probability
from canopy_tpu.errors import LogicError
from canopy_tpu.ops.bsr_propagate import (bsr_cost_report,
                                          bsr_top_probability, compile_bsr)
from canopy_tpu.utils.synthetic import synthetic_compiled_tree


class TestBsr:
    @pytest.mark.parametrize("locality", [None, 256])
    def test_matches_gather_engine(self, locality):
        tree = synthetic_compiled_tree(n_basic=512, n_gates=4000, fanin=4,
                                       n_levels=8, seed=1,
                                       locality=locality)
        program = compile_bsr(tree)
        batch = jnp.asarray(np.random.default_rng(0).uniform(
            0, 0.9, (64, tree.n_basic)), dtype=jnp.float32)
        got = np.asarray(bsr_top_probability(program, batch))
        expected = np.asarray(top_event_probability(tree, batch))
        np.testing.assert_allclose(got, expected, atol=2e-6)

    def test_hard_zero_one_exact(self):
        tree = synthetic_compiled_tree(n_basic=256, n_gates=1000, fanin=3,
                                       n_levels=6, seed=2, locality=128)
        program = compile_bsr(tree)
        states = jnp.asarray(
            (np.random.default_rng(1).random((32, tree.n_basic)) < 0.5)
            .astype(np.float32))
        got = np.asarray(bsr_top_probability(program, states))
        expected = np.asarray(top_event_probability(tree, states))
        np.testing.assert_array_equal(got, expected)

    def test_locality_reduces_fill(self):
        kw = dict(n_basic=2048, n_gates=20000, fanin=4, n_levels=10, seed=3)
        local = compile_bsr(synthetic_compiled_tree(locality=256, **kw))
        random = compile_bsr(synthetic_compiled_tree(locality=None, **kw))
        assert local.fill_ratio < random.fill_ratio * 0.5
        report = bsr_cost_report(local)
        assert report["nnz"] == 80000

    def test_rejects_count_gates(self):
        from canopy_tpu.compiler.graph import compile_gates
        from canopy_tpu.mef.event import (Arg, BasicEvent, Connective,
                                          Formula, Gate)
        from canopy_tpu.mef.expr import ConstantExpression
        events = []
        for i in range(3):
            e = BasicEvent(f"e{i}")
            e.expression = ConstantExpression(0.1)
            events.append(e)
        top = Gate("top")
        top.formula = Formula(Connective.ATLEAST,
                              [Arg(e) for e in events], min_number=2)
        tree = compile_gates([top])
        tree.top_index = tree.gate_index["top"]
        with pytest.raises(LogicError):
            compile_bsr(tree)


class TestHierarchicalStructure:
    def test_hierarchy_cuts_fill_an_order_of_magnitude(self):
        from canopy_tpu.utils.synthetic import synthetic_hierarchical_tree
        hier = synthetic_hierarchical_tree(n_basic=16384, branching=4,
                                           seed=1)
        rand = synthetic_compiled_tree(n_basic=4096, n_gates=hier.n_gates,
                                       fanin=4, n_levels=hier.depth, seed=1)
        fill_h = compile_bsr(hier).fill_ratio
        fill_r = compile_bsr(rand).fill_ratio
        assert fill_h < fill_r / 5

    def test_hierarchical_bsr_exact(self):
        from canopy_tpu.utils.synthetic import synthetic_hierarchical_tree
        tree = synthetic_hierarchical_tree(n_basic=1024, branching=4,
                                           seed=2)
        batch = jnp.asarray(np.random.default_rng(0).uniform(
            0, 0.9, (64, tree.n_basic)), dtype=jnp.float32)
        got = np.asarray(bsr_top_probability(compile_bsr(tree), batch))
        expected = np.asarray(top_event_probability(tree, batch))
        np.testing.assert_array_equal(got, expected)
