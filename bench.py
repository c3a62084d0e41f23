#!/usr/bin/env python
"""Benchmark harness: batched gate-propagation throughput vs HBM roofline.

Measures the flagship compute path — bottom-up probability propagation of a
synthetic benchmark-scale fault tree, batched over a trials axis (the SpMM
configuration of BASELINE.json config 2/3) — and reports effective
nnz x trials processed per second against the chip's HBM roofline for the
gather-dominated access pattern.

Prints exactly one JSON line on stdout:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
(vs_baseline = fraction of the HBM roofline achieved; BASELINE.md target
is >= 0.70). Details go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _hbm_bandwidth_bytes() -> float:
    """Per-chip HBM bandwidth estimate from the detected TPU generation."""
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "").lower()
    table = {"v4": 1.228e12, "v5e": 8.19e11, "v5p": 2.765e12,
             "v6e": 1.64e12}
    if gen in table:
        return table[gen]
    try:
        import jax
        kind = jax.devices()[0].device_kind.lower()
        for key, bw in table.items():
            if key in kind.replace(" ", ""):
                return bw
        if "lite" in kind:
            return table["v5e"]
    except Exception:
        pass
    return 8.19e11  # Conservative default (v5e-class).


def main() -> None:
    import jax
    import jax.numpy as jnp

    from canopy_tpu.engine.propagate import top_event_probability
    from canopy_tpu.utils.synthetic import synthetic_compiled_tree

    n_trials = int(os.environ.get("BENCH_TRIALS", "2048"))
    n_gates = int(os.environ.get("BENCH_GATES", "400000"))
    fanin = int(os.environ.get("BENCH_FANIN", "4"))
    dtype = jnp.float32
    # Regression guard: every section records (value, unit, ms/iter,
    # pinned iteration span) here; the full dict goes out as one
    # stderr JSON line at the end ("bench-sections: {...}") and the
    # sections measured before the contract line ride inside it, so
    # round-over-round engine regressions are mechanically diffable.
    sections: dict[str, dict] = {}

    def record(name, value, unit, dt, iters_used):
        sections[name] = {"value": value, "unit": unit,
                          "ms_per_iter": dt * 1e3, "iters": iters_used}

    tree = synthetic_compiled_tree(n_basic=8192, n_gates=n_gates,
                                   fanin=fanin, n_levels=14, seed=0)
    nnz = tree.nnz
    print(f"bench: {tree.n_gates} gates, nnz={nnz}, depth={tree.depth}, "
          f"trials={n_trials}, dtype={dtype.__name__}, "
          f"backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    iters = int(os.environ.get("BENCH_ITERS", "16"))

    # Production-model scale FIRST (fast compile -> the contract line is
    # never starved): the full-VPU tiled fused kernel, then the lane-row
    # fused kernel.
    tiled_value = 0.0
    try:
        from canopy_tpu.ops.pallas_kernels import (
            fused_propagate_tiled_staged, tile_trials)

        tiled_gates = int(os.environ.get("BENCH_TILED_GATES", "2048"))
        tiled_trials = int(os.environ.get("BENCH_TILED_TRIALS", "8192"))
        tree_t = synthetic_compiled_tree(n_basic=1024, n_gates=tiled_gates,
                                         fanin=8, n_levels=8, seed=0)
        basic_t = jnp.asarray(
            rng.uniform(0.0, 0.05, (tiled_trials, tree_t.n_basic)),
            dtype=dtype)
        no_house_t = np.zeros(0, np.float32)
        # Kernel-only measurement: tile the input once (hot loops do the
        # same — the layout transform costs ~3x the kernel), and rely on
        # the staged kernel's has_side_effects to forbid loop hoisting
        # instead of a per-iteration input perturbation (which would
        # re-pay the transform every iteration and dominate the timing).
        staged_t = jax.jit(tile_trials)(basic_t)

        @jax.jit
        def repeat_tiled(s, n_iter):
            def body(i, acc):
                out = fused_propagate_tiled_staged(tree_t, s, no_house_t)
                return acc + out.sum()
            return jax.lax.fori_loop(0, n_iter, body,
                                     jnp.asarray(0.0, dtype))

        def timed_tiled(n_iter):
            float(repeat_tiled(staged_t, n_iter))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(repeat_tiled(staged_t, n_iter))
                best = min(best, time.perf_counter() - t0)
            return best

        t_iters = int(os.environ.get("BENCH_TILED_ITERS", "512"))
        tiled_dt = max(
            (timed_tiled(2 + t_iters) - timed_tiled(2)) / t_iters, 1e-9)
        tiled_value = tree_t.nnz * tiled_trials / tiled_dt
        record("fused-tiled", tiled_value, "nnz*trials/s", tiled_dt, t_iters)
        print(f"bench[fused-tiled {tiled_gates}g]: {tiled_dt*1e3:.3f} ms/"
              f"iter, {tiled_value/1e9:.2f} Gnnz*trials/s",
              file=sys.stderr)
    except Exception as exc:
        print(f"bench[fused-tiled] skipped: {exc}", file=sys.stderr)

    fused_value = 0.0
    try:
        from canopy_tpu.ops.pallas_kernels import fused_propagate

        fused_gates = int(os.environ.get("BENCH_FUSED_GATES", "16384"))
        fused_trials = int(os.environ.get("BENCH_FUSED_TRIALS", "4096"))
        tree_f = synthetic_compiled_tree(n_basic=4096, n_gates=fused_gates,
                                         fanin=fanin, n_levels=10, seed=0)
        basic_f = jnp.asarray(
            rng.uniform(0.0, 0.05, (fused_trials, tree_f.n_basic)),
            dtype=dtype)
        no_house = np.zeros(0, np.float32)

        @jax.jit
        def repeat_fused(p, n_iter):
            def body(i, acc):
                out = fused_propagate(tree_f, p * (1.0 + 1e-7 * i),
                                      no_house)
                return acc + out.sum()
            return jax.lax.fori_loop(0, n_iter, body,
                                     jnp.asarray(0.0, dtype))

        def timed_fused(n_iter):
            float(repeat_fused(basic_f, n_iter))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(repeat_fused(basic_f, n_iter))
                best = min(best, time.perf_counter() - t0)
            return best

        f_iters = int(os.environ.get("BENCH_FUSED_ITERS", "64"))
        fused_dt = max(
            (timed_fused(2 + f_iters) - timed_fused(2)) / f_iters, 1e-9)
        fused_value = tree_f.nnz * fused_trials / fused_dt
        record("fused-vmem", fused_value, "nnz*trials/s", fused_dt, f_iters)
        print(f"bench[fused-vmem {fused_gates}g]: {fused_dt*1e3:.2f} ms/"
              f"iter, {fused_value/1e9:.2f} Gnnz*trials/s",
              file=sys.stderr)
    except Exception as exc:
        print(f"bench[fused-vmem] skipped: {exc}", file=sys.stderr)

    house = jnp.zeros((0,), dtype=dtype)

    # Iterations are chained inside one jitted fori_loop and reduced to a
    # scalar: a single dispatch and a single device-to-host transfer, so
    # remote/async dispatch semantics cannot fake the timing. Each
    # iteration perturbs the input (no CSE across iterations).

    # n_iter is a *traced* argument (fori_loop lowers to while), so one
    # compilation serves every iteration count — remote compiles are the
    # scarce resource on tunneled devices.
    @jax.jit
    def repeat_step(basic_p, n_iter):
        def body(i, acc):
            p = basic_p * (1.0 + 1e-7 * i)
            return acc + top_event_probability(tree, p, house).sum()
        return jax.lax.fori_loop(0, n_iter, body, jnp.asarray(0.0, dtype))

    basic_p = jnp.asarray(
        rng.uniform(0.0, 0.05, (n_trials, tree.n_basic)), dtype=dtype)

    def timed(n_iter):
        float(repeat_step(basic_p, n_iter))  # Warmup/compile this variant.
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(repeat_step(basic_p, n_iter))
            best = min(best, time.perf_counter() - t0)
        return best

    # Differencing two iteration counts cancels fixed dispatch/transfer
    # overhead (significant on tunneled devices).
    t_small = timed(2)
    t_large = timed(2 + iters)
    elapsed = max((t_large - t_small) / iters, 1e-9)

    gather_value = nnz * n_trials / elapsed
    record("gather", gather_value, "nnz*trials/s", elapsed, iters)

    # Roofline: per (nnz x trial) the gather reads 4 bytes and the gate
    # write amortizes to 4/fanin bytes; value-vector streaming re-reads
    # add ~4/fanin more. ~ (4 + 8/fanin) bytes per element.
    bytes_per_element = 4.0 + 8.0 / fanin
    roofline = _hbm_bandwidth_bytes() / bytes_per_element
    print(f"bench[gather {n_gates}g]: {elapsed*1e3:.2f} ms/iter, "
          f"{gather_value/1e9:.2f} Gnnz*trials/s, roofline "
          f"{roofline/1e9:.2f} G/s, fraction "
          f"{gather_value/roofline:.3f}", file=sys.stderr)

    value = max(gather_value, fused_value, tiled_value)
    vs_baseline = value / roofline
    engine = {gather_value: "gather", fused_value: "fused-vmem",
              tiled_value: "fused-tiled"}[value]
    print(f"bench: best engine = {engine}, {value/1e9:.2f} Gnnz*trials/s, "
          f"{vs_baseline:.3f} of the gather-formulation HBM roofline "
          f"(>1 = the fused kernel eliminated that traffic)",
          file=sys.stderr)

    # The contract line goes out FIRST so optional diagnostics below can
    # never starve it (remote compiles are slow and may hit timeouts).
    print(json.dumps({
        "metric": "spmm_gate_propagation_nnz_trials_per_s",
        "value": value,
        "unit": "nnz*trials/s",
        "vs_baseline": vs_baseline,
        "sections": {k: round(v["value"], 3)
                     for k, v in sections.items()},
    }), flush=True)

    budget_s = float(os.environ.get("BENCH_BUDGET_S", "2400"))
    bench_start = time.perf_counter()
    # BENCH_ONLY="spill,adjoint" runs just those secondary sections —
    # follow-up passes after a timeout need not recompile the rest.
    _only = os.environ.get("BENCH_ONLY")
    _only = set(_only.split(",")) if _only else None

    def _want(name):
        if _only is not None and name not in _only:
            raise TimeoutError(f"skipped (BENCH_ONLY={sorted(_only)})")

    # Secondary: importance backward — the adjoint stream program
    # (compiler/adjoint.py) vs XLA autodiff through the gather engine
    # on the same plant-shaped tree. One value_and_grad each.
    try:
        if time.perf_counter() - bench_start > budget_s:
            raise TimeoutError("budget exhausted")
        _want("adjoint")
        from canopy_tpu.ops.adjoint_kernel import (
            compile_adjoint, make_differentiable_stream)
        from canopy_tpu.ops.stream_kernel import compile_stream, stage_basic
        from canopy_tpu.utils.synthetic import synthetic_hierarchical_tree

        adj_basics = int(os.environ.get("BENCH_ADJ_BASICS", "8192"))
        adj_trials = 1024
        tree_a = synthetic_hierarchical_tree(
            n_basic=adj_basics, branching=8, share_fraction=0.1,
            n_shared=128, seed=0)
        program_a = compile_stream(tree_a)
        aprog_a = compile_adjoint(program_a)
        house_a = np.zeros(0, np.float32)
        f_a = make_differentiable_stream(aprog_a, house_a)
        basic_a = jnp.asarray(
            rng.uniform(0.0, 0.05, (adj_trials, tree_a.n_basic)), dtype)
        staged_a = jax.jit(lambda p: stage_basic(program_a, p))(basic_a)

        grad_stream = jax.jit(jax.value_and_grad(
            lambda s: f_a(s).sum()))
        grad_gather = jax.jit(jax.value_and_grad(
            lambda p: top_event_probability(
                tree_a, p, jnp.asarray(house_a)).sum()))

        @jax.jit
        def repeat_gs(s, n_iter):
            def body(i, acc):
                v, g = jax.value_and_grad(lambda x: f_a(x).sum())(s)
                return acc + v + g.sum()
            return jax.lax.fori_loop(0, n_iter, body,
                                     jnp.asarray(0.0, dtype))

        @jax.jit
        def repeat_gg(p, n_iter):
            def body(i, acc):
                v, g = jax.value_and_grad(lambda x: top_event_probability(
                    tree_a, x * (1.0 + 1e-7 * i),
                    jnp.asarray(house_a)).sum())(p)
                return acc + v + g.sum()
            return jax.lax.fori_loop(0, n_iter, body,
                                     jnp.asarray(0.0, dtype))

        def timed_vg(fn, arg, n_iter):
            float(fn(arg, n_iter))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(arg, n_iter))
                best = min(best, time.perf_counter() - t0)
            return best

        a_iters = int(os.environ.get("BENCH_ADJ_ITERS", "64"))
        as_dt = max((timed_vg(repeat_gs, staged_a, 2 + a_iters)
                     - timed_vg(repeat_gs, staged_a, 2)) / a_iters, 1e-9)
        ag_iters = max(a_iters // 8, 8)
        ag_dt = max((timed_vg(repeat_gg, basic_a, 2 + ag_iters)
                     - timed_vg(repeat_gg, basic_a, 2)) / ag_iters, 1e-9)
        # Gradient agreement on hardware (value_and_grad both paths).
        v_s, g_s = grad_stream(staged_a)
        v_g, g_g = grad_gather(basic_a)
        from canopy_tpu.ops.stream_kernel import unstage_basic
        g_s_un = np.asarray(unstage_basic(program_a, g_s))
        rel_g = float(np.max(np.abs(g_s_un - np.asarray(g_g))
                             / np.maximum(np.abs(np.asarray(g_g)), 1e-20)))
        record("adjoint-stream-vjp", tree_a.nnz * adj_trials / as_dt,
               "nnz*trials/s fwd+bwd", as_dt, a_iters)
        record("gather-autodiff-vjp", tree_a.nnz * adj_trials / ag_dt,
               "nnz*trials/s fwd+bwd", ag_dt, ag_iters)
        print(f"bench[adjoint {tree_a.n_gates}g]: stream fwd+bwd "
              f"{as_dt*1e3:.3f} ms/iter vs gather autodiff "
              f"{ag_dt*1e3:.2f} ms/iter -> {ag_dt/as_dt:.1f}x "
              f"(max rel grad err {rel_g:.1e})", file=sys.stderr)
    except Exception as exc:  # pragma: no cover - secondary metric only
        print(f"bench[adjoint] skipped: {exc}", file=sys.stderr)

    # Secondary: the streaming (register-allocated) kernel on a
    # hierarchical plant-shaped tree too big for VMEM residency — the
    # structured-big-tree engine, compared against the gather engine on
    # the same cone.
    try:
        _want("stream")
        from canopy_tpu.ops.stream_kernel import (compile_stream,
                                                  stage_basic,
                                                  stream_propagate_staged)
        from canopy_tpu.utils.synthetic import synthetic_hierarchical_tree

        s_basics = int(os.environ.get("BENCH_STREAM_BASICS", "65536"))
        s_trials = int(os.environ.get("BENCH_STREAM_TRIALS", "2048"))
        tree_s = synthetic_hierarchical_tree(
            n_basic=s_basics, branching=8, share_fraction=0.1,
            n_shared=256, seed=0)
        program_s = compile_stream(tree_s)
        basic_s = jnp.asarray(
            rng.uniform(0.0, 0.05, (s_trials, tree_s.n_basic)), dtype)
        staged = jax.jit(lambda p: stage_basic(program_s, p))(basic_s)
        house_s = np.zeros(0, np.float32)

        # The kernel carries has_side_effects (XLA cannot hoist it out
        # of the loop), so no per-iteration input perturbation is
        # needed — perturbing would copy the staged array each iter and
        # mask the kernel. The DMA floor check below guards the timing.
        @jax.jit
        def repeat_stream(s, n_iter):
            def body(i, acc):
                v = stream_propagate_staged(program_s, s, house_s)
                return acc + v.sum()
            return jax.lax.fori_loop(0, n_iter, body,
                                     jnp.asarray(0.0, dtype))

        def timed_stream(n_iter):
            float(repeat_stream(staged, n_iter))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(repeat_stream(staged, n_iter))
                best = min(best, time.perf_counter() - t0)
            return best

        s_iters = int(os.environ.get("BENCH_STREAM_ITERS", "256"))
        s_dt = max(
            (timed_stream(2 + s_iters) - timed_stream(2)) / s_iters, 1e-9)
        s_value = program_s.nnz * s_trials / s_dt
        record("stream-hier", s_value, "nnz*trials/s", s_dt, s_iters)
        dma_bytes = (program_s.n_chunks * program_s.chunk_tiles
                     * (s_trials // 1024) * 4096)
        print(f"bench[stream {tree_s.n_gates}g hier]: {s_dt*1e3:.3f} ms/"
              f"iter, {s_value/1e9:.2f} Gnnz*trials/s, DMA "
              f"{dma_bytes/1e6:.0f} MB -> {dma_bytes/1e9/s_dt:.0f} GB/s "
              f"({dma_bytes/1e9/s_dt/(_hbm_bandwidth_bytes()/1e9):.2f} of "
              "HBM)", file=sys.stderr)
    except Exception as exc:  # pragma: no cover - secondary metric only
        print(f"bench[stream] skipped: {exc}", file=sys.stderr)

    # Secondary: the spill-tier stream engine on the 65k-gate *uniform*
    # tree — the access pattern whose live set (~5k tiles) rejects the
    # plain stream pool and previously fell back to the issue-rate-bound
    # gather engine at 0.27 of roofline (the one declared north-star
    # miss). Belady-scheduled HBM scratch: coalesced eviction slabs,
    # prefetched single-tile refills (compiler/spill.py).
    try:
        if time.perf_counter() - bench_start > budget_s:
            raise TimeoutError("budget exhausted")
        _want("spill")
        from canopy_tpu.compiler.spill import build_spill_schedule
        from canopy_tpu.ops.stream_kernel import (spill_propagate_staged,
                                                  stage_basic)

        sp_gates = int(os.environ.get("BENCH_SPILL_GATES", "65536"))
        sp_trials = int(os.environ.get("BENCH_SPILL_TRIALS", "4096"))
        tree_sp = synthetic_compiled_tree(n_basic=8192, n_gates=sp_gates,
                                          fanin=fanin, n_levels=14, seed=0)
        program_sp = build_spill_schedule(tree_sp)
        basic_sp = jnp.asarray(
            rng.uniform(0.0, 0.05, (sp_trials, tree_sp.n_basic)), dtype)
        staged_sp = jax.jit(lambda p: stage_basic(program_sp, p))(basic_sp)
        house_sp = np.zeros(0, np.float32)

        @jax.jit
        def repeat_spill(s, n_iter):
            def body(i, acc):
                v = spill_propagate_staged(program_sp, s, house_sp)
                return acc + v.sum()
            return jax.lax.fori_loop(0, n_iter, body,
                                     jnp.asarray(0.0, dtype))

        def timed_spill(n_iter):
            float(repeat_spill(staged_sp, n_iter))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(repeat_spill(staged_sp, n_iter))
                best = min(best, time.perf_counter() - t0)
            return best

        sp_iters = int(os.environ.get("BENCH_SPILL_ITERS", "64"))
        sp_dt = max(
            (timed_spill(2 + sp_iters) - timed_spill(2)) / sp_iters, 1e-9)
        sp_value = program_sp.nnz * sp_trials / sp_dt
        record("spill-uniform", sp_value, "nnz*trials/s", sp_dt, sp_iters)
        # DMA accounting per trial-tile step: staged chunk reads (incl.
        # per-segment re-staging), eviction flushes, refills, boundary
        # dump/loads — the bytes the schedule actually moves.
        flat_sp = [op for seg in program_sp.segments for op in seg]
        tiles_moved = (
            sum(program_sp.chunk_tiles for op in flat_sp
                if op[0] == "start")
            + sum(1 for op in flat_sp if op[0] in ("evict", "rstart"))
            + sum(program_sp.pool_slots for op in flat_sp
                  if op[0] in ("dstart", "lstart")))
        sp_bytes = tiles_moved * 4096 * (sp_trials // 1024)
        # Correctness on hardware: one batch vs the gather engine.
        check = np.asarray(spill_propagate_staged(
            program_sp, staged_sp, house_sp))
        ref = np.asarray(top_event_probability(
            tree_sp, basic_sp, house), np.float32)
        rel = float(np.max(np.abs(check - ref) / np.maximum(ref, 1e-30)))
        print(f"bench[spill {tree_sp.n_gates}g uniform]: "
              f"{sp_dt*1e3:.3f} ms/iter, {sp_value/1e9:.2f} "
              f"Gnnz*trials/s = {sp_value/roofline:.2f} of the "
              f"gather-formulation roofline "
              f"({len(program_sp.segments)} segments, "
              f"{program_sp.n_evicted} evicted, "
              f"{program_sp.n_refills} refills; DMA "
              f"{sp_bytes/1e6:.0f} MB -> {sp_bytes/1e9/sp_dt:.0f} GB/s = "
              f"{sp_bytes/1e9/sp_dt/(_hbm_bandwidth_bytes()/1e9):.2f} of "
              f"HBM; max rel err vs gather {rel:.1e})", file=sys.stderr)
    except Exception as exc:  # pragma: no cover - secondary metric only
        print(f"bench[spill] skipped: {exc}", file=sys.stderr)

    # Secondary: config-3 scale — the 1M-gate synthetic on one chip
    # (BASELINE.md:36). Index arrays ride as jit ARGUMENTS
    # (make_param_propagator): baked-in constants would ship ~30 MB in
    # every remote-compile request (HTTP 413 on tunneled devices).
    # Memory plan (docs/BENCHMARKS.md): T=1024 f32 value matrix =
    # ~4.3 GB; bf16 doubles trials in the same bytes.
    try:
        if time.perf_counter() - bench_start > budget_s:
            raise TimeoutError("budget exhausted")
        _want("config3")
        from canopy_tpu.engine.propagate import make_param_propagator

        m_gates = int(os.environ.get("BENCH_M_GATES", "1000000"))
        m_trials = int(os.environ.get("BENCH_M_TRIALS", "1024"))
        tree_m = synthetic_compiled_tree(n_basic=65536, n_gates=m_gates,
                                         fanin=fanin, n_levels=14, seed=0)
        fn_m, params_m = make_param_propagator(tree_m)
        params_m = jax.device_put(params_m)
        basic_m = jnp.asarray(
            rng.uniform(0.0, 0.05, (m_trials, tree_m.n_basic)), dtype)
        house_m = jnp.zeros((0,), dtype)

        @jax.jit
        def repeat_m(params, p, n_iter):
            def body(i, acc):
                return acc + fn_m(params, p * (1.0 + 1e-7 * i),
                                  house_m).sum()
            return jax.lax.fori_loop(0, n_iter, body,
                                     jnp.asarray(0.0, dtype))

        def timed_m(n_iter):
            float(repeat_m(params_m, basic_m, n_iter))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(repeat_m(params_m, basic_m, n_iter))
                best = min(best, time.perf_counter() - t0)
            return best

        m_iters = int(os.environ.get("BENCH_M_ITERS", "8"))
        m_dt = max((timed_m(2 + m_iters) - timed_m(2)) / m_iters, 1e-9)
        m_value = tree_m.nnz * m_trials / m_dt
        record("config3-1M-gates", m_value, "nnz*trials/s", m_dt, m_iters)
        print(f"bench[config3 {tree_m.n_gates}g 1M]: {m_dt*1e3:.2f} ms/"
              f"iter, {m_value/1e9:.2f} Gnnz*trials/s = "
              f"{m_value/roofline:.3f} of the gather-formulation "
              f"roofline (nnz={tree_m.nnz}, T={m_trials})",
              file=sys.stderr)
    except Exception as exc:  # pragma: no cover - secondary metric only
        print(f"bench[config3-1M] skipped: {exc}", file=sys.stderr)

    # Secondary: exact-BDD streaming evaluation (one fused Shannon mux
    # per node) — exact per-trial quantification of a shared-event model.
    try:
        if time.perf_counter() - bench_start > budget_s:
            raise TimeoutError("budget exhausted")
        _want("bdd")
        from canopy_tpu.compiler.bdd import build_bdd
        from canopy_tpu.compiler.graph import compile_gates
        from canopy_tpu.ops.stream_kernel import (compile_bdd_stream,
                                                  stage_basic,
                                                  stream_propagate_staged)
        from canopy_tpu.utils.synthetic import synthetic_mef_tree

        top_b, _ = synthetic_mef_tree(n_basic=300, n_gates=260, fanin=3,
                                      seed=9, atleast_fraction=0.1,
                                      complement_fraction=0.0)
        tree_b = compile_gates([top_b])
        tree_b.top_index = tree_b.gate_index[top_b.id]
        bdd_b = build_bdd(tree_b, max_nodes=20_000_000)
        program_b = compile_bdd_stream(bdd_b)
        bdd_trials = 2048
        basic_b = jnp.asarray(
            rng.uniform(0.0, 0.02, (bdd_trials, tree_b.n_basic)), dtype)
        cols_b = basic_b[:, jnp.asarray(program_b.stage_cols)] \
            if program_b.stage_cols is not None else basic_b
        staged_b = jax.jit(lambda c: stage_basic(program_b, c))(cols_b)
        empty_house = np.zeros(0, np.float32)

        @jax.jit
        def repeat_bdd(s, n_iter):
            def body(i, acc):
                v = stream_propagate_staged(program_b, s, empty_house)
                return acc + v.sum()
            return jax.lax.fori_loop(0, n_iter, body,
                                     jnp.asarray(0.0, dtype))

        def timed_bdd(n_iter):
            float(repeat_bdd(staged_b, n_iter))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(repeat_bdd(staged_b, n_iter))
                best = min(best, time.perf_counter() - t0)
            return best

        b_iters = int(os.environ.get("BENCH_BDD_ITERS", "1024"))
        bdd_dt = max(
            (timed_bdd(2 + b_iters) - timed_bdd(2)) / b_iters, 1e-9)
        record("bdd-stream", bdd_trials / bdd_dt, "exact quantifications/s", bdd_dt, b_iters)
        print(f"bench[bdd-stream {bdd_b.n_nodes}n exact]: "
              f"{bdd_dt*1e3:.3f} ms/iter, "
              f"{bdd_trials/bdd_dt/1e6:.1f}M exact quantifications/s",
              file=sys.stderr)
    except Exception as exc:  # pragma: no cover - secondary metric only
        print(f"bench[bdd-stream] skipped: {exc}", file=sys.stderr)

    # Secondary: bf16-storage gather on the big uniform tree at double
    # the trial width. The engine is row-issue-rate-bound, and bf16
    # halves row bytes, so T=4096 fits the f32 T=2048 memory ceiling and
    # carries ~2x the trials per issued row (compute stays f32; one
    # rounding per level).
    try:
        if time.perf_counter() - bench_start > budget_s:
            raise TimeoutError("budget exhausted")
        _want("bf16")
        bf_trials = 2 * n_trials
        basic_bf = jnp.asarray(
            rng.uniform(0.0, 0.05, (bf_trials, tree.n_basic)),
            jnp.bfloat16)
        house_bf = jnp.zeros((0,), jnp.bfloat16)

        @jax.jit
        def repeat_bf(p, n_iter):
            def body(i, acc):
                # Perturbation above bf16 granularity (defeats CSE).
                pp = p * (1.0 + 0.01 * i)
                out = top_event_probability(tree, pp, house_bf)
                return acc + out.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, n_iter, body,
                                     jnp.asarray(0.0, jnp.float32))

        def timed_bf(n_iter):
            float(repeat_bf(basic_bf, n_iter))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(repeat_bf(basic_bf, n_iter))
                best = min(best, time.perf_counter() - t0)
            return best

        bf_dt = max((timed_bf(2 + iters) - timed_bf(2)) / iters, 1e-9)
        bf_value = nnz * bf_trials / bf_dt
        record("gather-bf16", bf_value, "nnz*trials/s", bf_dt, iters)
        print(f"bench[gather-bf16 {n_gates}g T={bf_trials}]: "
              f"{bf_dt*1e3:.2f} ms/iter, {bf_value/1e9:.2f} "
              f"Gnnz*trials/s ({bf_value/max(gather_value,1):.2f}x f32)",
              file=sys.stderr)
    except Exception as exc:  # pragma: no cover - secondary metric only
        print(f"bench[gather-bf16] skipped: {exc}", file=sys.stderr)

    # Secondary: the bit-packed Boolean MC engine (32 trials per uint32
    # word) on the same structure — the aleatory-simulation headline.
    try:
        if time.perf_counter() - bench_start > budget_s:
            raise TimeoutError("budget exhausted")
        _want("mc")
        from canopy_tpu.ops.bitpack import propagate_packed

        mc_words = max(n_trials // 32, 8)

        @jax.jit
        def repeat_packed(packed_basic, n_iter):
            def body(i, acc):
                p = packed_basic ^ i.astype(jnp.uint32)
                vals = propagate_packed(tree, p, house)
                count = jax.lax.population_count(vals[tree.top_index])
                return acc + count.sum().astype(jnp.float32)
            return jax.lax.fori_loop(0, n_iter, body,
                                     jnp.asarray(0.0, jnp.float32))

        packed = jnp.asarray(
            rng.integers(0, 2**32, (tree.n_basic, mc_words),
                         dtype=np.uint32))

        def timed_packed(n_iter):
            float(repeat_packed(packed, n_iter))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(repeat_packed(packed, n_iter))
                best = min(best, time.perf_counter() - t0)
            return best

        mc_elapsed = max(
            (timed_packed(2 + iters) - timed_packed(2)) / iters, 1e-9)
        mc_value = nnz * mc_words * 32 / mc_elapsed
        record("mc-bitpacked", mc_value, "nnz*trials/s", mc_elapsed, iters)
        print(f"bench[mc-bitpacked]: {mc_elapsed*1e3:.2f} ms/iter, "
              f"{mc_value/1e9:.2f} Gnnz*trials/s "
              f"({mc_value/max(value,1):.1f}x the float path)",
              file=sys.stderr)
    except Exception as exc:  # pragma: no cover - secondary metric only
        print(f"bench[mc-bitpacked] skipped: {exc}", file=sys.stderr)

    # Tertiary: the block-gather engine, direct-space mode (per-fan
    # one-hot copy matmuls + VPU product — no log/exp) vs the log-space
    # formulation vs the gather engine, all on the same locality-
    # reordered tree.
    try:
        if time.perf_counter() - bench_start > budget_s:
            raise TimeoutError("budget exhausted")
        from canopy_tpu.compiler.reorder import locality_reorder
        _want("block-gather")
        from canopy_tpu.ops.block_gather import (auto_t_tile,
                                                 block_gather_propagate,
                                                 compile_block_gather)
        from canopy_tpu.utils.synthetic import synthetic_hierarchical_tree

        bg_basics = int(os.environ.get("BENCH_BG_BASICS", "32768"))
        tree_bg = locality_reorder(synthetic_hierarchical_tree(
            n_basic=bg_basics, branching=8, share_fraction=0.1,
            n_shared=256, seed=0), hot_first=True).tree
        program_bg = compile_block_gather(tree_bg)
        bg_t = auto_t_tile(program_bg)
        bg_trials = bg_t
        basic_bg = jnp.asarray(
            rng.uniform(0.0, 0.05, (bg_trials, tree_bg.n_basic)), dtype)

        def make_repeat(mode):
            @jax.jit
            def repeat(p, n_iter):
                def body(i, acc):
                    v = block_gather_propagate(program_bg, p,
                                               t_tile=bg_t, mode=mode)
                    return acc + v.sum()
                return jax.lax.fori_loop(0, n_iter, body,
                                         jnp.asarray(0.0, dtype))
            return repeat

        @jax.jit
        def repeat_gather_bg(p, n_iter):
            def body(i, acc):
                pp = p * (1.0 + 1e-7 * i)
                return acc + top_event_probability(tree_bg, pp,
                                                   house).sum()
            return jax.lax.fori_loop(0, n_iter, body,
                                     jnp.asarray(0.0, dtype))

        def timed_bg(fn, n_iter):
            float(fn(basic_bg, n_iter))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(basic_bg, n_iter))
                best = min(best, time.perf_counter() - t0)
            return best

        bg_iters = int(os.environ.get("BENCH_BG_ITERS", "64"))
        results = {}
        for mode in ("direct", "log"):
            fn = make_repeat(mode)
            dt = max((timed_bg(fn, 2 + bg_iters)
                      - timed_bg(fn, 2)) / bg_iters, 1e-9)
            results[mode] = dt
            record(f"block-gather-{mode}",
                   tree_bg.nnz * bg_trials / dt, "nnz*trials/s", dt,
                   bg_iters)
        g_dt = max((timed_bg(repeat_gather_bg, 2 + bg_iters)
                    - timed_bg(repeat_gather_bg, 2)) / bg_iters, 1e-9)
        record("gather-on-bg-tree", tree_bg.nnz * bg_trials / g_dt,
               "nnz*trials/s", g_dt, bg_iters)
        # Exactness of the direct mode on hardware.
        got = np.asarray(block_gather_propagate(program_bg, basic_bg,
                                                t_tile=bg_t,
                                                mode="direct"))
        ref = np.asarray(top_event_probability(tree_bg, basic_bg, house),
                         np.float32)
        bitex = "bit-exact" if np.array_equal(got, ref) else \
            f"max rel err {np.max(np.abs(got - ref) / np.maximum(ref, 1e-30)):.1e}"
        print(f"bench[block-gather {tree_bg.n_gates}g T={bg_trials}]: "
              f"direct {results['direct']*1e3:.3f} ms vs log "
              f"{results['log']*1e3:.3f} ms vs gather {g_dt*1e3:.3f} ms "
              f"-> direct is {g_dt/results['direct']:.2f}x gather, "
              f"{results['log']/results['direct']:.2f}x log ({bitex})",
              file=sys.stderr)
    except Exception as exc:  # pragma: no cover - tertiary metric only
        print(f"bench[block-gather] skipped: {exc}", file=sys.stderr)

    # Tertiary: the BSR/MXU log-space engine after the locality
    # reordering pass, on an adversarially *shuffled* hierarchical tree
    # (models an input format whose slot assignment destroyed the
    # plant's subsystem structure) vs the gather engine on the same
    # tree.
    try:
        if time.perf_counter() - bench_start > budget_s:
            raise TimeoutError("budget exhausted")
        _want("bsr")
        from canopy_tpu.compiler.reorder import (locality_reorder,
                                                 random_shuffle)
        from canopy_tpu.ops.bsr_propagate import (bsr_arrays,
                                                  bsr_top_probability,
                                                  compile_bsr,
                                                  estimate_bsr_fill)
        from canopy_tpu.utils.synthetic import synthetic_hierarchical_tree

        bsr_basics = int(os.environ.get("BENCH_BSR_BASICS", "262144"))
        branching = int(os.environ.get("BENCH_BSR_BRANCHING", "8"))
        shuffled = random_shuffle(synthetic_hierarchical_tree(
            n_basic=bsr_basics, branching=branching, share_fraction=0.1,
            n_shared=256, seed=0), seed=1).tree
        fill_shuffled = estimate_bsr_fill(shuffled)
        tree_l = locality_reorder(shuffled).tree
        program = compile_bsr(tree_l)
        bsr_params = jax.device_put(bsr_arrays(program))
        bsr_trials = min(n_trials, 512)
        basic_p_bsr = jnp.asarray(
            rng.uniform(0.0, 0.05, (bsr_trials, tree_l.n_basic)),
            dtype=dtype)

        @jax.jit
        def repeat_bsr(basic_p, n_iter, params):
            def body(i, acc):
                p = basic_p * (1.0 + 1e-7 * i)
                return acc + bsr_top_probability(
                    program, p, params=params).sum()
            return jax.lax.fori_loop(0, n_iter, body,
                                     jnp.asarray(0.0, dtype))

        def repeat_bsr_bound(basic_p, n_iter):
            return repeat_bsr(basic_p, n_iter, bsr_params)

        @jax.jit
        def repeat_gather_l(basic_p, n_iter):
            def body(i, acc):
                p = basic_p * (1.0 + 1e-7 * i)
                return acc + top_event_probability(tree_l, p, house).sum()
            return jax.lax.fori_loop(0, n_iter, body,
                                     jnp.asarray(0.0, dtype))

        def timed_fn(fn, n_iter):
            float(fn(basic_p_bsr, n_iter))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(basic_p_bsr, n_iter))
                best = min(best, time.perf_counter() - t0)
            return best

        bsr_dt = max((timed_fn(repeat_bsr_bound, 2 + iters)
                      - timed_fn(repeat_bsr_bound, 2)) / iters, 1e-9)
        gat_dt = max((timed_fn(repeat_gather_l, 2 + iters)
                      - timed_fn(repeat_gather_l, 2)) / iters, 1e-9)
        bsr_v = tree_l.nnz * bsr_trials / bsr_dt
        gat_v = tree_l.nnz * bsr_trials / gat_dt
        record("bsr+reorder", bsr_v, "nnz*trials/s", bsr_dt, iters)
        record("gather-on-reordered", gat_v, "nnz*trials/s", gat_dt, iters)
        print(f"bench[bsr+reorder br={branching}]: {bsr_dt*1e3:.2f} ms "
              f"({bsr_v/1e9:.2f} G/s, fill {fill_shuffled:.0f}x -> "
              f"{program.fill_ratio:.0f}x) vs gather {gat_dt*1e3:.2f} ms "
              f"({gat_v/1e9:.2f} G/s) -> {gat_dt/bsr_dt:.2f}x",
              file=sys.stderr)
    except Exception as exc:  # pragma: no cover - tertiary metric only
        print(f"bench[bsr] skipped: {exc}", file=sys.stderr)

    # Machine-parseable record of EVERY section (regression guard —
    # compare against the bench-sections line in the previous round's
    # log / docs/BENCHMARKS.md).
    print("bench-sections: " + json.dumps(sections), file=sys.stderr)


if __name__ == "__main__":
    main()
