"""HBM spill tier: Belady schedule + hazard-checked simulation + kernel.

The schedule (``compiler/spill.py``) is pure host code validated two
ways: a host-side reference interpreter executes the op grammar with
async-DMA hazard checking (ordering bugs fail loudly), and the Pallas
kernel runs in interpret mode on CPU — both compared against the gather
engine, which is itself tested against brute-force oracles.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from canopy_tpu.compiler.graph import compile_gates
from canopy_tpu.compiler.spill import (build_spill_schedule,
                                       simulate_spill_program)
from canopy_tpu.engine.propagate import top_event_probability
from canopy_tpu.errors import LogicError
from canopy_tpu.ops.stream_kernel import spill_propagate
from canopy_tpu.utils.synthetic import (synthetic_compiled_tree,
                                        synthetic_mef_tree)

from test_stream_kernel import mixed_tree


def _mef_tree(**kwargs):
    top, _events = synthetic_mef_tree(**kwargs)
    tree = compile_gates([top])
    tree.top_index = tree.gate_index[top.id]
    return tree


def _simulate_vs_gather(tree, program, n_trials=4, seed=0, rtol=1e-6):
    rng = np.random.default_rng(seed)
    house = tree.house_state_vector()
    for _ in range(n_trials):
        basic = rng.uniform(0.0, 1.0, tree.n_basic)
        got = simulate_spill_program(program, basic, house)
        want = float(top_event_probability(
            tree, jnp.asarray(basic[None, :], jnp.float32),
            jnp.asarray(house))[0])
        assert got == pytest.approx(want, rel=rtol)


class TestSpillSchedule:
    def test_small_pool_forces_evictions(self):
        tree = synthetic_compiled_tree(n_basic=64, n_gates=256, fanin=4,
                                       n_levels=5, seed=1)
        program = build_spill_schedule(tree, chunk_tiles=8, pool_slots=10,
                                       slab_tiles=4)
        assert program.n_evicted > 0
        assert program.n_refills > 0
        assert program.pool_slots == 10
        _simulate_vs_gather(tree, program)

    @pytest.mark.parametrize("pool,slab,hoist", [
        (8, 2, 0), (8, 2, 64), (12, 8, 16), (24, 4, 4)])
    def test_simulator_matches_gather(self, pool, slab, hoist):
        tree = synthetic_compiled_tree(n_basic=96, n_gates=300, fanin=4,
                                       n_levels=6, seed=2)
        program = build_spill_schedule(
            tree, chunk_tiles=8, pool_slots=pool, slab_tiles=slab,
            hoist_events=hoist, n_refill_sems=3, n_flush_sems=2)
        _simulate_vs_gather(tree, program)

    def test_mef_tree_with_counts_and_complements(self):
        tree = _mef_tree(n_basic=80, n_gates=60, fanin=4, seed=5,
                         atleast_fraction=0.25, complement_fraction=0.2)
        program = build_spill_schedule(tree, chunk_tiles=4, pool_slots=32,
                                       slab_tiles=3, hoist_events=8)
        assert program.n_evicted > 0
        _simulate_vs_gather(tree, program)

    def test_segmentation_dump_reload(self):
        tree = synthetic_compiled_tree(n_basic=64, n_gates=256, fanin=4,
                                       n_levels=5, seed=1)
        program = build_spill_schedule(
            tree, chunk_tiles=8, pool_slots=12, slab_tiles=4,
            max_ops_per_segment=16)
        assert len(program.segments) == -(-program.n_ops // 16)
        assert len(program.segments) > 3
        flat = [op for seg in program.segments for op in seg]
        tags = [op[0] for op in flat]
        assert tags.count("dstart") == len(program.segments) - 1
        assert tags.count("lstart") == len(program.segments) - 1
        _simulate_vs_gather(tree, program)

    def test_shared_events_reevict_without_rewrite(self):
        # A model whose shared deep events force evict -> refill ->
        # evict chains; re-evictions must not grow the scratch.
        tree = _mef_tree(n_basic=50, n_gates=80, fanin=5, seed=11,
                         atleast_fraction=0.0, complement_fraction=0.0)
        program = build_spill_schedule(tree, chunk_tiles=4, pool_slots=30,
                                       slab_tiles=2, hoist_events=4)
        flat = [op for seg in program.segments for op in seg]
        n_evict_ops = sum(1 for op in flat if op[0] == "evict")
        assert n_evict_ops == program.n_evicted  # One slab write each.
        assert program.n_refills >= program.n_evicted
        _simulate_vs_gather(tree, program)

    def test_scratch_rows_accounting(self):
        tree = synthetic_compiled_tree(n_basic=64, n_gates=256, fanin=4,
                                       n_levels=5, seed=1)
        program = build_spill_schedule(tree, chunk_tiles=8, pool_slots=10,
                                       slab_tiles=4)
        assert program.scratch_rows == program.pool_slots + program.n_evicted

    def test_pool_too_small_rejected(self):
        tree = mixed_tree()
        with pytest.raises(LogicError):
            build_spill_schedule(tree, chunk_tiles=2, pool_slots=3)

    def test_flush_before_refill_invariant(self):
        """Every scratch-row refill start follows the flush-wait of the
        batch that wrote the row (the schedule invariant the kernel's
        correctness rests on)."""
        tree = synthetic_compiled_tree(n_basic=96, n_gates=300, fanin=4,
                                       n_levels=6, seed=2)
        program = build_spill_schedule(tree, chunk_tiles=8, pool_slots=8,
                                       slab_tiles=2, hoist_events=64)
        for seg in program.segments:
            ready = set(range(program.pool_slots))   # dump region
            for op in seg:
                if op[0] == "efwait":
                    _t, _buf, _off0, n, row0, _sem = op
                    ready.update(range(row0, row0 + n))
                elif op[0] == "rstart" and op[1] == 1:
                    assert op[2] in ready, \
                        f"refill of unflushed scratch row {op[2]}"


class TestSpillKernel:
    def test_interpret_mixed_tree_with_house(self):
        # Tiny tree (no evictions): the plain-stream op subset plus the
        # spill kernel's plumbing, house events included.
        tree = mixed_tree()
        program = build_spill_schedule(
            tree, chunk_tiles=2, pool_slots=8, slab_tiles=2,
            hoist_events=6, n_refill_sems=3, n_flush_sems=2)
        rng = np.random.default_rng(0)
        basic = jnp.asarray(
            rng.uniform(0.0, 1.0, (1024, tree.n_basic)), jnp.float32)
        house = tree.house_state_vector()
        got = spill_propagate(program, basic, house, interpret=True)
        want = top_event_probability(tree, basic, jnp.asarray(house))
        # Interpret-mode contraction can differ from the XLA gather
        # path by 1 ULP on CPU (on hardware the engines are bit-exact).
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(want, np.float32),
                                   rtol=1e-6, atol=1e-7)

    @pytest.mark.parametrize("pool,slab,segment_ops", [
        (12, 4, 10 ** 9), (12, 4, 40), (20, 8, 25)])
    def test_interpret_matches_gather(self, pool, slab, segment_ops):
        tree = synthetic_compiled_tree(n_basic=96, n_gates=300, fanin=4,
                                       n_levels=6, seed=2)
        program = build_spill_schedule(
            tree, chunk_tiles=8, pool_slots=pool, slab_tiles=slab,
            max_ops_per_segment=segment_ops, hoist_events=6,
            n_refill_sems=3, n_flush_sems=2)
        assert program.n_evicted > 0
        if segment_ops < 100:
            assert len(program.segments) > 1
        rng = np.random.default_rng(0)
        basic = jnp.asarray(
            rng.uniform(0.0, 1.0, (1024, tree.n_basic)), jnp.float32)
        house = tree.house_state_vector()
        got = spill_propagate(program, basic, house, interpret=True)
        want = top_event_probability(tree, basic, jnp.asarray(house))
        # Interpret-mode contraction can differ from the XLA gather
        # path by 1 ULP on CPU (on hardware the engines are bit-exact).
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(want, np.float32),
                                   rtol=1e-6, atol=1e-7)

    def test_interpret_synthetic_with_counts(self):
        tree = _mef_tree(n_basic=60, n_gates=45, fanin=4, seed=7,
                         atleast_fraction=0.3, complement_fraction=0.1)
        program = build_spill_schedule(tree, chunk_tiles=4, pool_slots=24,
                                       slab_tiles=4, hoist_events=12)
        assert program.n_evicted > 0
        rng = np.random.default_rng(1)
        basic = jnp.asarray(
            rng.uniform(0.0, 0.9, (1024, tree.n_basic)), jnp.float32)
        house = tree.house_state_vector()
        got = spill_propagate(program, basic, house, interpret=True)
        want = top_event_probability(tree, basic, jnp.asarray(house))
        # Interpret-mode contraction can differ from the XLA gather
        # path by 1 ULP on CPU (on hardware the engines are bit-exact).
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(want, np.float32),
                                   rtol=1e-6, atol=1e-7)

    def test_multi_tile_trials(self):
        tree = mixed_tree(n_house=0)
        program = build_spill_schedule(tree, chunk_tiles=2, pool_slots=8,
                                       slab_tiles=2)
        rng = np.random.default_rng(2)
        basic = jnp.asarray(
            rng.uniform(0.0, 1.0, (2048, tree.n_basic)), jnp.float32)
        got = spill_propagate(program, basic, np.zeros(0, np.float32),
                              interpret=True)
        want = top_event_probability(tree, basic,
                                     jnp.zeros(0, jnp.float32))
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(want, np.float32),
                                   rtol=1e-6, atol=1e-7)


class TestAutoDispatchGuard:
    """The thrashing guard is backend-independent logic: heavy refill
    density sends auto mode back to gather (measured on v5e — the
    single-tile refill DMA floor), mild spilling keeps the engine."""

    def test_uniform_tree_predicted_thrashing(self):
        from canopy_tpu.compiler.spill import build_spill_schedule
        from canopy_tpu.engine.propagate import spill_auto_ok
        from canopy_tpu.utils.synthetic import synthetic_compiled_tree
        tree = synthetic_compiled_tree(n_basic=2048, n_gates=16384,
                                       fanin=4, n_levels=12, seed=0)
        # Tiny pool forces heavy refill traffic (models the 65k case).
        program = build_spill_schedule(tree, pool_slots=96,
                                       chunk_tiles=32, slab_tiles=16)
        assert program.n_refills > 0.15 * program.n_ops
        assert not spill_auto_ok(program)

    def test_mild_spill_kept(self):
        from canopy_tpu.compiler.spill import build_spill_schedule
        from canopy_tpu.engine.propagate import spill_auto_ok
        from canopy_tpu.utils.synthetic import synthetic_hierarchical_tree
        tree = synthetic_hierarchical_tree(n_basic=4096, branching=8,
                                           share_fraction=0.1,
                                           n_shared=64, seed=0)
        program = build_spill_schedule(tree, chunk_tiles=32)
        assert spill_auto_ok(program)
