"""Streaming fused-tiled kernel: schedule + interpret-mode execution.

The schedule (``compiler/schedule.py``) is pure host code; the kernel
runs in Pallas interpret mode on CPU with TPU DMA semantics, compared
against the gather engine (``engine/propagate``) which is itself tested
against brute-force oracles.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from canopy_tpu.compiler.graph import compile_gates
from canopy_tpu.compiler.schedule import build_stream_schedule
from canopy_tpu.engine.propagate import top_event_probability
from canopy_tpu.errors import LogicError
from canopy_tpu.mef.event import (Arg, BasicEvent, Connective, Formula,
                                  Gate, HouseEvent)
from canopy_tpu.mef.expr import ConstantExpression
from canopy_tpu.ops.stream_kernel import (compile_stream, stream_propagate,
                                          stream_supported)
from canopy_tpu.utils.synthetic import (synthetic_compiled_tree,
                                        synthetic_mef_tree)


def mixed_tree(n_house=1):
    """Small tree with sharing, complements, house, pair and count gates."""
    events = []
    for i, p in enumerate([0.1, 0.3, 0.5, 0.2, 0.4, 0.6, 0.25, 0.35]):
        e = BasicEvent(f"e{i}")
        e.expression = ConstantExpression(p)
        events.append(e)
    houses = []
    for i in range(n_house):
        h = HouseEvent(f"h{i}")
        h.state = bool(i % 2)
        houses.append(h)
    g1 = Gate("g1")
    g1.formula = Formula(Connective.AND, [Arg(events[0]), Arg(events[1])])
    g2 = Gate("g2")
    args2 = [Arg(events[2]), Arg(events[3], True)]
    if houses:
        args2.append(Arg(houses[0]))
    g2.formula = Formula(Connective.OR, args2)
    g3 = Gate("g3")
    g3.formula = Formula(Connective.ATLEAST,
                         [Arg(events[4]), Arg(events[5]), Arg(events[6])],
                         min_number=2)
    g4 = Gate("g4")
    g4.formula = Formula(Connective.XOR, [Arg(g1), Arg(events[7])])
    g5 = Gate("g5")  # Shares e0/e1 with g1 (long staging lifetimes).
    g5.formula = Formula(Connective.OR, [Arg(events[0]), Arg(g3)])
    top = Gate("top")
    top.formula = Formula(
        Connective.OR, [Arg(g2, True), Arg(g4), Arg(g5), Arg(events[1])])
    tree = compile_gates([top])
    tree.top_index = tree.gate_index["top"]
    return tree


def run_both(tree, n_trials=1024, chunk_tiles=2, seed=0):
    rng = np.random.default_rng(seed)
    basic = jnp.asarray(
        rng.uniform(0.0, 1.0, (n_trials, tree.n_basic)), jnp.float32)
    house = tree.house_state_vector()
    program = compile_stream(tree, chunk_tiles=chunk_tiles)
    got = stream_propagate(program, basic, house, interpret=True)
    want = top_event_probability(tree, basic, jnp.asarray(house))
    return np.asarray(got), np.asarray(want, np.float32), program


class TestSchedule:
    def test_pool_is_register_allocated(self):
        tree = synthetic_compiled_tree(n_basic=128, n_gates=512, fanin=4,
                                       n_levels=6, seed=3)
        program = build_stream_schedule(tree, chunk_tiles=8)
        # The live set must be far below the node count (that's the
        # whole point vs the fused kernel's whole-tree residency).
        assert program.pool_slots < tree.n_gates // 2
        assert program.top_slot < program.pool_slots

    def test_spills_and_double_buffering(self):
        tree = mixed_tree()
        # Depth 2 forces shared events to outlive their chunk (the
        # default 3-deep ring keeps them resident on this small tree).
        program = build_stream_schedule(tree, chunk_tiles=2, n_bufs=2)
        tags = [op[0] for op in program.ops]
        assert tags.count("start") == program.n_chunks
        assert tags.count("wait") == program.n_chunks
        assert program.n_chunks > program.n_bufs  # Forces ring reuse.
        assert "spill" in tags        # Shared events outlive their chunk.
        # Every wait is preceded by its start; buffer reuse never starts
        # before the previous occupant's wait.
        nb = program.n_bufs
        seen_start, seen_wait = set(), set()
        for op in program.ops:
            if op[0] == "start":
                assert op[1] - nb in seen_wait or op[1] < nb
                assert op[2] == op[1] % nb
                seen_start.add(op[1])
            elif op[0] == "wait":
                assert op[1] in seen_start
                seen_wait.add(op[1])

    def test_three_chunk_fanin_rejected(self):
        events = []
        for i in range(40):
            e = BasicEvent(f"w{i}")
            e.expression = ConstantExpression(0.01)
            events.append(e)
        top = Gate("top")
        top.formula = Formula(Connective.OR, [Arg(e) for e in events])
        tree = compile_gates([top])
        tree.top_index = tree.gate_index["top"]
        with pytest.raises(LogicError):
            build_stream_schedule(tree, chunk_tiles=2)
        assert not stream_supported(tree, chunk_tiles=2)
        assert stream_supported(tree, chunk_tiles=64)

    def test_cone_only_execution(self):
        # Gates outside the top cone are dead-code-eliminated.
        tree = synthetic_compiled_tree(n_basic=64, n_gates=256, fanin=3,
                                       n_levels=5, seed=1)
        program = build_stream_schedule(tree, chunk_tiles=16)
        assert program.nnz <= tree.nnz


class TestStreamPropagate:
    def test_mixed_tree_matches_gather(self):
        tree = mixed_tree()
        got, want, program = run_both(tree, chunk_tiles=2)
        assert program.n_chunks >= 3
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-7)

    def test_two_buffer_ring_with_spills(self):
        tree = mixed_tree()
        rng = np.random.default_rng(9)
        basic = jnp.asarray(
            rng.uniform(0.0, 1.0, (1024, tree.n_basic)), jnp.float32)
        house = tree.house_state_vector()
        program = compile_stream(tree, chunk_tiles=2, n_bufs=2)
        assert any(op[0] == "spill" for op in program.ops)
        got = stream_propagate(program, basic, house, interpret=True)
        want = top_event_probability(tree, basic, jnp.asarray(house))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want, np.float32),
            rtol=2e-6, atol=1e-7)

    def test_house_event_states(self):
        tree = mixed_tree(n_house=1)
        rng = np.random.default_rng(1)
        basic = jnp.asarray(
            rng.uniform(0.0, 1.0, (1024, tree.n_basic)), jnp.float32)
        program = compile_stream(tree, chunk_tiles=4)
        for state in (0.0, 1.0):
            house = np.asarray([state], np.float32)
            got = stream_propagate(program, basic, house, interpret=True)
            want = top_event_probability(tree, basic, jnp.asarray(house))
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want, np.float32),
                rtol=2e-6, atol=1e-7)

    def test_prod_only_tree(self):
        # Same multiplies in the same order as the gather engine; any
        # difference is XLA fusion contraction (~1 ulp), not algorithm.
        tree = synthetic_compiled_tree(n_basic=256, n_gates=512, fanin=4,
                                       n_levels=6, seed=0)
        got, want, _ = run_both(tree, n_trials=1024, chunk_tiles=16)
        np.testing.assert_allclose(got, want, rtol=5e-7)

    def test_multiple_trial_tiles(self):
        tree = synthetic_compiled_tree(n_basic=64, n_gates=128, fanin=3,
                                       n_levels=4, seed=2)
        got, want, _ = run_both(tree, n_trials=2048, chunk_tiles=8)
        np.testing.assert_allclose(got, want, rtol=5e-7)

    def test_mef_tree_with_sharing(self):
        top, _events = synthetic_mef_tree(n_basic=48, n_gates=36, fanin=3,
                                          seed=5)
        tree = compile_gates([top])
        tree.top_index = tree.gate_index[top.id]
        got, want, program = run_both(tree, chunk_tiles=4)
        assert program.n_chunks >= 3
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-7)

    def test_single_chunk_small_tree(self):
        tree = mixed_tree(n_house=0)
        got, want, program = run_both(tree, chunk_tiles=256)
        assert program.n_chunks == 1
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-7)

    def test_trial_multiple_required(self):
        tree = mixed_tree(n_house=0)
        program = compile_stream(tree, chunk_tiles=8)
        with pytest.raises(LogicError):
            stream_propagate(program, jnp.zeros((100, tree.n_basic)),
                             np.zeros(0, np.float32), interpret=True)


class TestBddStream:
    """Exact BDD evaluation as a streaming mux program."""

    def _tree_with_sharing(self, seed=5):
        top, _ = synthetic_mef_tree(n_basic=40, n_gates=30, fanin=3,
                                    seed=seed, atleast_fraction=0.15,
                                    complement_fraction=0.1)
        tree = compile_gates([top])
        tree.top_index = tree.gate_index[top.id]
        return tree

    @pytest.mark.parametrize("seed", [5, 9])
    def test_matches_level_scheduled_eval(self, seed):
        from canopy_tpu.compiler.bdd import build_bdd
        from canopy_tpu.engine.bdd_eval import bdd_probability
        from canopy_tpu.ops.stream_kernel import (compile_bdd_stream,
                                                  stream_bdd_probability)

        tree = self._tree_with_sharing(seed)
        bdd = build_bdd(tree)
        program = compile_bdd_stream(bdd, chunk_tiles=4)
        rng = np.random.default_rng(seed)
        basic = jnp.asarray(
            rng.uniform(0.0, 1.0, (1024, tree.n_basic)), jnp.float32)
        got = np.asarray(stream_bdd_probability(program, basic,
                                                interpret=True))
        want = np.asarray(bdd_probability(bdd, basic), np.float32)
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-7)

    def test_exactness_on_shared_events(self):
        # Direct propagation is approximate on shared events; the BDD
        # stream must be exact — verified against brute-force
        # enumeration on a deliberately shared structure.
        import itertools
        from canopy_tpu.compiler.bdd import build_bdd
        from canopy_tpu.mef.expr import ConstantExpression

        events = []
        for i in range(4):
            e = BasicEvent(f"s{i}")
            e.expression = ConstantExpression(0.3)
            events.append(e)
        g1 = Gate("g1")
        g1.formula = Formula(Connective.AND, [Arg(events[0]),
                                              Arg(events[1])])
        g2 = Gate("g2")
        g2.formula = Formula(Connective.AND, [Arg(events[0]),
                                              Arg(events[2])])
        top = Gate("tops")
        top.formula = Formula(Connective.OR,
                              [Arg(g1), Arg(g2), Arg(events[3])])
        tree = compile_gates([top])
        tree.top_index = tree.gate_index["tops"]
        bdd = build_bdd(tree)
        from canopy_tpu.ops.stream_kernel import (compile_bdd_stream,
                                                  stream_bdd_probability)
        program = compile_bdd_stream(bdd, chunk_tiles=2)
        rng = np.random.default_rng(3)
        p_row = rng.uniform(0.0, 1.0, 4).astype(np.float32)
        basic = jnp.broadcast_to(jnp.asarray(p_row), (1024, 4))
        got = float(np.asarray(stream_bdd_probability(
            program, basic, interpret=True))[0])
        exact = 0.0
        for states in itertools.product([0, 1], repeat=4):
            w = np.prod([p_row[i] if s else 1 - p_row[i]
                         for i, s in enumerate(states)])
            val = (states[0] and states[1]) or \
                  (states[0] and states[2]) or states[3]
            exact += w * bool(val)
        assert abs(got - exact) < 1e-5

    def test_constant_bdd_rejected(self):
        from canopy_tpu.compiler.bdd import build_bdd
        from canopy_tpu.ops.stream_kernel import compile_bdd_stream
        from canopy_tpu.mef.expr import ConstantExpression

        a = BasicEvent("ca")
        a.expression = ConstantExpression(0.5)
        g1 = Gate("cg1")
        g1.formula = Formula(Connective.NULL, [Arg(a)])
        top = Gate("cg")
        top.formula = Formula(Connective.IMPLY, [Arg(g1), Arg(a)])
        tree = compile_gates([top])
        tree.top_index = tree.gate_index["cg"]
        with pytest.raises(LogicError):
            compile_bdd_stream(build_bdd(tree))


class TestBddEvaluatorDispatch:
    def test_cpu_falls_back_to_level_eval(self):
        from canopy_tpu.compiler.bdd import build_bdd
        from canopy_tpu.engine.bdd_eval import (bdd_probability,
                                                make_bdd_evaluator)

        top, _ = synthetic_mef_tree(n_basic=24, n_gates=18, fanin=3,
                                    seed=2)
        tree = compile_gates([top])
        tree.top_index = tree.gate_index[top.id]
        bdd = build_bdd(tree)
        fn = make_bdd_evaluator(bdd)
        rng = np.random.default_rng(0)
        p = jnp.asarray(rng.uniform(0, 1, (64, tree.n_basic)))
        np.testing.assert_allclose(np.asarray(fn(p)),
                                   np.asarray(bdd_probability(bdd, p)),
                                   rtol=1e-12)


class TestModularStream:
    """Modular BDD chain streamed module-by-module (exact)."""

    def _modular_model(self):
        # Two independent subtrees (modules) + a shared-event section.
        events = []
        for i in range(9):
            e = BasicEvent(f"m{i}")
            e.expression = ConstantExpression(0.1 + 0.05 * i)
            events.append(e)
        g1 = Gate("mg1")
        g1.formula = Formula(Connective.AND, [Arg(events[0]),
                                              Arg(events[1])])
        g2 = Gate("mg2")
        g2.formula = Formula(Connective.OR, [Arg(events[2]),
                                             Arg(events[3]),
                                             Arg(events[4])])
        g3 = Gate("mg3")  # Shares m5 with g4: not a module boundary.
        g3.formula = Formula(Connective.AND, [Arg(events[5]),
                                              Arg(events[6])])
        g4 = Gate("mg4")
        g4.formula = Formula(Connective.OR, [Arg(events[5]),
                                             Arg(events[7])])
        top = Gate("mtop")
        top.formula = Formula(Connective.OR, [
            Arg(g1), Arg(g2), Arg(g3), Arg(g4), Arg(events[8])])
        tree = compile_gates([top])
        tree.top_index = tree.gate_index["mtop"]
        return tree

    def test_matches_modular_probability(self):
        from canopy_tpu.compiler.modules import (build_modular_bdd,
                                                 modular_probability)
        from canopy_tpu.engine.bdd_eval import make_modular_evaluator

        tree = self._modular_model()
        modular = build_modular_bdd(tree)
        assert len(modular.chain) > 1  # Real module decomposition.
        fn = make_modular_evaluator(modular, _interpret=True, min_nodes=0)
        rng = np.random.default_rng(4)
        basic = jnp.asarray(
            rng.uniform(0.0, 1.0, (1024, tree.n_basic)), jnp.float32)
        got = np.asarray(fn(basic))
        want = np.asarray(modular_probability(modular, basic), np.float32)
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-7)

    def test_off_grid_falls_back(self):
        from canopy_tpu.compiler.modules import (build_modular_bdd,
                                                 modular_probability)
        from canopy_tpu.engine.bdd_eval import make_modular_evaluator

        tree = self._modular_model()
        modular = build_modular_bdd(tree)
        fn = make_modular_evaluator(modular, _interpret=True, min_nodes=0)
        rng = np.random.default_rng(5)
        basic = jnp.asarray(
            rng.uniform(0.0, 1.0, (100, tree.n_basic)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(fn(basic)),
            np.asarray(modular_probability(modular, basic), np.float32),
            rtol=1e-6)

    def test_synthetic_chain(self):
        from canopy_tpu.compiler.modules import (build_modular_bdd,
                                                 modular_probability)
        from canopy_tpu.engine.bdd_eval import make_modular_evaluator

        top, _ = synthetic_mef_tree(n_basic=30, n_gates=22, fanin=3,
                                    seed=13, atleast_fraction=0.2)
        tree = compile_gates([top])
        tree.top_index = tree.gate_index[top.id]
        modular = build_modular_bdd(tree)
        fn = make_modular_evaluator(modular, _interpret=True, min_nodes=0)
        rng = np.random.default_rng(6)
        basic = jnp.asarray(
            rng.uniform(0.0, 1.0, (1024, tree.n_basic)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(fn(basic)),
            np.asarray(modular_probability(modular, basic), np.float32),
            rtol=2e-6, atol=1e-7)


class TestPropagatorDispatch:
    def test_explicit_stream_rejects_house_override(self):
        from canopy_tpu.engine.propagate import make_propagator

        tree = mixed_tree(n_house=1)
        fn = make_propagator(tree, engine="stream")
        basic = jnp.zeros((1024, tree.n_basic), jnp.float32)
        with pytest.raises(ValueError):
            fn(basic, jnp.asarray([1.0]))

    def test_build_time_house_states(self):
        from canopy_tpu.engine.propagate import (make_propagator,
                                                 top_event_probability)

        tree = mixed_tree(n_house=1)
        rng = np.random.default_rng(2)
        basic = jnp.asarray(
            rng.uniform(0, 1, (8, tree.n_basic)), jnp.float32)
        for hs in (0.0, 1.0):
            fn = make_propagator(tree, house_states=np.asarray([hs]))
            got = np.asarray(fn(basic))
            want = np.asarray(top_event_probability(
                tree, basic, jnp.asarray([hs])))
            np.testing.assert_allclose(got, want, rtol=1e-12)
