"""Adjoint stream program: schedule, simulator, kernels, importance.

The adjoint schedule (``compiler/adjoint.py``) is validated three ways:
the host scalar simulator (with async-DMA hazard assertions) against
``jax.grad`` of the gather engine; the interpret-mode Pallas kernels
against per-trial gather gradients; and the ``custom_vjp`` wrapper end
to end through ``importance_measures`` and the differentiable BDD
evaluators.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from canopy_tpu.compiler.adjoint import (build_adjoint_schedule,
                                         simulate_adjoint_program)
from canopy_tpu.compiler.bdd import build_bdd
from canopy_tpu.compiler.graph import compile_gates
from canopy_tpu.compiler.modules import build_modular_bdd, modular_probability
from canopy_tpu.engine.bdd_eval import (bdd_probability, make_bdd_evaluator,
                                        make_modular_evaluator)
from canopy_tpu.engine.importance import (importance_measures,
                                          make_stream_importance_fn)
from canopy_tpu.engine.propagate import top_event_probability
from canopy_tpu.mef.event import (Arg, BasicEvent, Connective, Formula, Gate)
from canopy_tpu.mef.expr import ConstantExpression
from canopy_tpu.ops.adjoint_kernel import (adjoint_backward_staged,
                                           compile_adjoint,
                                           make_differentiable_stream,
                                           tape_propagate_staged)
from canopy_tpu.ops.stream_kernel import (compile_stream, stage_basic,
                                          stream_propagate_staged,
                                          unstage_basic)
from canopy_tpu.utils.synthetic import synthetic_compiled_tree

from test_stream_kernel import mixed_tree


def connective_tree():
    """Every canonical family incl. inverted outputs (nand/nor/imply)."""
    events = []
    for i, p in enumerate([0.12, 0.3, 0.52, 0.21, 0.44, 0.6, 0.27]):
        e = BasicEvent(f"e{i}")
        e.expression = ConstantExpression(p)
        events.append(e)
    g1 = Gate("g1")
    g1.formula = Formula(Connective.NAND, [Arg(events[0]), Arg(events[1])])
    g2 = Gate("g2")
    g2.formula = Formula(Connective.NOR,
                         [Arg(events[2]), Arg(events[3], True)])
    g3 = Gate("g3")
    g3.formula = Formula(Connective.IMPLY, [Arg(events[4]), Arg(events[5])])
    g4 = Gate("g4")
    g4.formula = Formula(Connective.CARDINALITY,
                         [Arg(events[0]), Arg(events[4], True),
                          Arg(events[6])], min_number=0, max_number=1)
    g5 = Gate("g5")
    g5.formula = Formula(Connective.IFF, [Arg(g1), Arg(g2)])
    top = Gate("top")
    top.formula = Formula(Connective.OR,
                          [Arg(g5), Arg(g3, True), Arg(g4)])
    tree = compile_gates([top])
    tree.top_index = tree.gate_index["top"]
    return tree


def gather_grad(tree, basic_p, house):
    """Per-trial gather-engine gradients (the autodiff oracle)."""
    def loss(bp):
        return top_event_probability(tree, bp, jnp.asarray(house)).sum()
    return jax.grad(loss)(basic_p)


class TestSimulator:
    @pytest.mark.parametrize("tree_fn,chunk", [
        (mixed_tree, 2), (mixed_tree, 1), (connective_tree, 2)])
    def test_matches_gather_grad(self, tree_fn, chunk):
        tree = tree_fn()
        program = compile_stream(tree, chunk_tiles=chunk)
        aprog = build_adjoint_schedule(program, slab_tiles=4,
                                       tape_chunk_tiles=4)
        rng = np.random.default_rng(7)
        house = tree.house_state_vector()
        for _ in range(5):
            p = rng.uniform(0.0, 1.0, tree.n_basic)
            top, grad = simulate_adjoint_program(aprog, p, house)
            want_top = float(top_event_probability(
                tree, jnp.asarray(p, jnp.float32), jnp.asarray(house)))
            want_grad = np.asarray(gather_grad(
                tree, jnp.asarray(p[None, :]), house))[0]
            assert top == pytest.approx(want_top, rel=1e-6)
            np.testing.assert_allclose(grad, want_grad, rtol=2e-5,
                                       atol=1e-7)

    def test_synthetic_stress(self):
        """Bigger tree, tiny chunks/slabs/tape chunks: exercises ring
        rotation, slab flushes, spilled basics, and the hazard checks."""
        tree = synthetic_compiled_tree(n_basic=96, n_gates=320, fanin=4,
                                       n_levels=6, seed=11)
        program = compile_stream(tree, chunk_tiles=4)
        aprog = build_adjoint_schedule(program, slab_tiles=8,
                                       tape_chunk_tiles=16)
        assert aprog.n_tape_chunks > 3          # ring actually rotates
        rng = np.random.default_rng(5)
        p = rng.uniform(0.0, 1.0, tree.n_basic)
        house = tree.house_state_vector()
        top, grad = simulate_adjoint_program(aprog, p, house)
        want_grad = np.asarray(gather_grad(
            tree, jnp.asarray(p[None, :]), house))[0]
        np.testing.assert_allclose(grad, want_grad, rtol=5e-5, atol=1e-7)


class TestKernels:
    def run_case(self, tree, n_trials=2048, chunk_tiles=2, tct=8, seed=3):
        program = compile_stream(tree, chunk_tiles=chunk_tiles)
        aprog = compile_adjoint(program, slab_tiles=8,
                                tape_chunk_tiles=tct)
        rng = np.random.default_rng(seed)
        basic = jnp.asarray(
            rng.uniform(0.0, 1.0, (n_trials, tree.n_basic)), jnp.float32)
        house = tree.house_state_vector()
        staged = stage_basic(program, basic)
        out, tape = tape_propagate_staged(aprog, staged, house,
                                          interpret=True)
        # The taped forward is bit-identical to the plain stream kernel.
        plain = stream_propagate_staged(program, staged, house,
                                        interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(plain))
        ct = jnp.ones_like(out)
        gstaged = adjoint_backward_staged(aprog, tape, ct, house,
                                          interpret=True)
        grad = unstage_basic(program, gstaged)
        want = gather_grad(tree, basic, house)
        np.testing.assert_allclose(np.asarray(grad), np.asarray(want),
                                   rtol=5e-4, atol=1e-6)

    def test_mixed_tree(self):
        self.run_case(mixed_tree())

    def test_connective_tree(self):
        self.run_case(connective_tree())

    def test_single_chunk(self):
        self.run_case(mixed_tree(), chunk_tiles=64, tct=256)

    def test_custom_vjp_wrapper(self):
        tree = mixed_tree()
        program = compile_stream(tree, chunk_tiles=2)
        aprog = compile_adjoint(program, slab_tiles=8, tape_chunk_tiles=8)
        house = tree.house_state_vector()
        f = make_differentiable_stream(aprog, house, interpret=True)
        rng = np.random.default_rng(0)
        basic = jnp.asarray(
            rng.uniform(0.0, 1.0, (1024, tree.n_basic)), jnp.float32)

        def loss(bp):
            return f(stage_basic(program, bp)).sum()
        val, grad = jax.value_and_grad(loss)(basic)
        want_val = top_event_probability(
            tree, basic, jnp.asarray(house)).sum()
        want_grad = gather_grad(tree, basic, house)
        assert float(val) == pytest.approx(float(want_val), rel=1e-5)
        np.testing.assert_allclose(np.asarray(grad), np.asarray(want_grad),
                                   rtol=5e-4, atol=1e-6)
        # Primal-only call avoids the tape entirely and stays bit-exact.
        np.testing.assert_array_equal(
            np.asarray(f(stage_basic(program, basic))),
            np.asarray(stream_propagate_staged(
                program, stage_basic(program, basic), house,
                interpret=True)))


class TestImportance:
    def test_stream_importance_matches_gather(self):
        tree = mixed_tree()
        house = tree.house_state_vector()
        p = jnp.asarray(
            np.random.default_rng(2).uniform(0.05, 0.9, tree.n_basic))
        top_fn = make_stream_importance_fn(tree, house, interpret=True)
        assert top_fn is not None
        got = importance_measures(tree, p, jnp.asarray(house),
                                  top_fn=top_fn)
        want = importance_measures(tree, p, jnp.asarray(house))
        assert got.top_probability == pytest.approx(want.top_probability,
                                                    rel=1e-5)
        np.testing.assert_allclose(got.mif, want.mif, rtol=5e-4, atol=1e-6)
        np.testing.assert_allclose(got.raw, want.raw, rtol=5e-4, atol=1e-6)
        np.testing.assert_allclose(got.rrw, want.rrw, rtol=5e-4, atol=1e-6)


class TestBddAdjoint:
    def test_bdd_evaluator_differentiable(self):
        tree = mixed_tree()
        bdd = build_bdd(tree)
        ev = make_bdd_evaluator(bdd, engine="stream", _interpret=True,
                                differentiable=True)
        rng = np.random.default_rng(4)
        basic = jnp.asarray(
            rng.uniform(0.0, 1.0, (1024, tree.n_basic)), jnp.float32)

        def loss(bp):
            return ev(bp).sum()

        def want_loss(bp):
            return bdd_probability(bdd, bp).sum()
        val, grad = jax.value_and_grad(loss)(basic)
        want_val, want_grad = jax.value_and_grad(want_loss)(basic)
        assert float(val) == pytest.approx(float(want_val), rel=1e-5)
        np.testing.assert_allclose(np.asarray(grad), np.asarray(want_grad),
                                   rtol=5e-4, atol=1e-6)

    def test_modular_evaluator_differentiable(self):
        tree = mixed_tree()
        modular = build_modular_bdd(tree)
        ev = make_modular_evaluator(modular, engine="stream",
                                    _interpret=True, differentiable=True)
        rng = np.random.default_rng(9)
        basic = jnp.asarray(
            rng.uniform(0.0, 1.0, (1024, tree.n_basic)), jnp.float32)
        val, grad = jax.value_and_grad(lambda bp: ev(bp).sum())(basic)
        want_val, want_grad = jax.value_and_grad(
            lambda bp: modular_probability(modular, bp).sum())(basic)
        assert float(val) == pytest.approx(float(want_val), rel=1e-5)
        np.testing.assert_allclose(np.asarray(grad), np.asarray(want_grad),
                                   rtol=5e-4, atol=1e-6)


class TestScheduleInvariants:
    def test_tape_rows_cover_eligible_args(self):
        tree = mixed_tree()
        program = compile_stream(tree, chunk_tiles=2)
        aprog = build_adjoint_schedule(program, tape_chunk_tiles=8)
        n_tput = sum(1 for op in aprog.fwd_ops if op[0] == "tput")
        assert n_tput == aprog.tape_rows
        # Every tape row is read by exactly one bgate argument (track
        # which chunk currently occupies each ring buffer).
        reads = [0] * aprog.tape_rows
        chunk_in_buf = {}
        for op in aprog.bwd_ops:
            if op[0] == "twait":
                chunk_in_buf[op[2]] = op[1]
            elif op[0] == "bgate":
                for vloc, _g, _f in op[3]:
                    if vloc[0] == "tape":
                        k = chunk_in_buf[vloc[1]]
                        reads[k * aprog.tape_chunk_tiles + vloc[2]] += 1
        assert all(r == 1 for r in reads)
        # Flush/wait pairing on both DMA streams.
        for stream, start, wait in (("tf", "tfstart", "tfwait"),
                                    ("gf", "gfstart", "gfwait")):
            ops = aprog.fwd_ops if stream == "tf" else aprog.bwd_ops
            n_start = sum(1 for op in ops if op[0] == start)
            n_wait = sum(1 for op in ops if op[0] == wait)
            assert n_start == n_wait, stream

    def test_vmem_budget_rejection(self):
        from canopy_tpu.errors import LogicError
        tree = mixed_tree()
        program = compile_stream(tree, chunk_tiles=2)
        with pytest.raises(LogicError):
            build_adjoint_schedule(program, vmem_budget=16 * 4096)
