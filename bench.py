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

Harness discipline (every section):

* Iterations chain inside one jitted ``fori_loop`` reduced to a scalar —
  one dispatch, one device-to-host transfer, so remote/async dispatch
  cannot fake the timing.  ``n_iter`` is a *traced* argument, so one
  compile serves every iteration count (remote compiles are the scarce
  resource on tunneled devices).
* Every loop body is made loop-variant by carrying the input through the
  loop and perturbing a single tile/column per iteration (a few KB of
  traffic) — identical anti-hoisting scheme on both sides of every
  comparison; ``has_side_effects`` alone is NOT trusted (the r3
  fused-tiled collapse).
* Differenced timings are *validated*: the span between the two
  iteration counts must exceed timer noise, and the resulting value must
  be physically plausible (<= ``cap`` x the roofline).  Implausible
  timings retry with a doubled span and hard-fail the section — they are
  never published (r3 published 983,280x the roofline).
* Each section runs in its own function and frees its device buffers and
  jit caches on exit, so an OOM in one section cannot cascade into the
  rest (r3 lost 6 of 13 sections to one leak).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

import numpy as np

#: Wall-clock anchor for the whole-process budget (the driver kills the
#: bench ~30 min after launch; BENCH_r03 and BENCH_r04 both lost
#: sections to overruns, so the budget is measured from *process start*
#: and every section's subprocess timeout is clamped to what remains).
_T0 = time.perf_counter()

# Persistent XLA compilation cache: remote compiles through the tunnel
# are the dominant section cost (measured 197 s -> 0.5 s on a cache
# hit, fresh process).  The cache dir lives in the repo so rehearsal
# runs warm it for the driver's run.  Exported (not just config-set) so
# per-section subprocesses inherit it.  BENCH_COMPILE_CACHE=0 disables.
if os.environ.get("BENCH_COMPILE_CACHE", "1") == "1":
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))

def _code_hash() -> str:
    """Hash of every canopy_tpu source file: host/export cache keys
    embed it, so any PACKAGE change invalidates cached build products
    (stale schedules must never produce numbers).  bench.py itself is
    deliberately excluded — harness-only edits (ordering, budgets,
    logging) must not cold the rehearsal-warmed caches; if a section's
    MEASURED function changes, clear .jax_cache/{host,exported}
    manually."""
    import hashlib
    h = hashlib.sha256()
    root = os.path.dirname(os.path.abspath(__file__))
    files = []
    for dirpath, _dirs, names in os.walk(os.path.join(root,
                                                      "canopy_tpu")):
        files += [os.path.join(dirpath, n) for n in sorted(names)
                  if n.endswith(".py")]
    for path in sorted(files):
        with open(path, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()[:12]


_CODE_HASH = None


def host_cached(key: str, builder):
    """Pickle-cache deterministic host-side build products (synthetic
    trees, replay/spill/adjoint schedules) next to the XLA compile
    cache.  Schedule building is pure Python and costs minutes at
    1M-gate scale — a warmed cache lets the driver's run spend its
    window on measurements.  Keys embed a hash of all package sources;
    BENCH_HOST_CACHE=0 disables."""
    global _CODE_HASH
    import pickle
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not cache_dir or os.environ.get("BENCH_HOST_CACHE", "1") != "1":
        return builder()
    if _CODE_HASH is None:
        _CODE_HASH = _code_hash()
    host_dir = os.path.join(cache_dir, "host")
    os.makedirs(host_dir, exist_ok=True)
    path = os.path.join(host_dir, f"{key}-{_CODE_HASH}.pkl")
    if os.path.exists(path):
        t0 = time.perf_counter()
        with open(path, "rb") as fh:
            obj = pickle.load(fh)
        print(f"bench: host-cache hit {key} "
              f"({time.perf_counter()-t0:.1f}s load)", file=sys.stderr)
        return obj
    t0 = time.perf_counter()
    obj = builder()
    try:
        with open(path, "wb") as fh:
            pickle.dump(obj, fh, protocol=pickle.HIGHEST_PROTOCOL)
        print(f"bench: host-cache MISS {key} "
              f"(built {time.perf_counter()-t0:.0f}s)", file=sys.stderr)
    except Exception as exc:           # unpicklable: build-only
        print(f"bench: host-cache skip {key}: {exc}", file=sys.stderr)
    return obj


def export_cache_has(key: str) -> bool:
    """Whether a serialized export exists for ``key`` on THIS backend
    (used to skip sections whose one-time trace exceeds the driver
    window when the cache is cold)."""
    global _CODE_HASH
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not cache_dir or os.environ.get("BENCH_EXPORT_CACHE", "1") != "1":
        return False
    import jax
    if _CODE_HASH is None:
        _CODE_HASH = _code_hash()
    return os.path.exists(os.path.join(
        cache_dir, "exported",
        f"{key}-{jax.default_backend()}-{_CODE_HASH}.bin"))


def exported_cached(key: str, fn, *example_args):
    """Cache a jitted function as a serialized ``jax.export`` blob.

    Host TRACING is the warm-run bottleneck for the straight-line
    kernel sections (the 16k replay-adjoint section spends ~8 min
    re-tracing per process even with every XLA compile cached).  A
    serialized export skips tracing entirely: measured on the tunneled
    TPU, a 4k-gate replay chain went 71.3 s (trace+compile) -> 2.2 s
    (deserialize + compile-cache hit) in a fresh process.  Keys embed
    the package source hash (stale executables must never produce
    numbers); output pytrees are preserved by ``exp.call``.
    ``BENCH_EXPORT_CACHE=0`` disables.
    """
    global _CODE_HASH
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not cache_dir or os.environ.get("BENCH_EXPORT_CACHE", "1") != "1":
        return fn
    import jax
    if _CODE_HASH is None:
        _CODE_HASH = _code_hash()
    d = os.path.join(cache_dir, "exported")
    os.makedirs(d, exist_ok=True)
    # Exports carry platform lowering — a CPU-smoke export must never
    # be loaded by a TPU run (and vice versa).
    backend = jax.default_backend()
    path = os.path.join(d, f"{key}-{backend}-{_CODE_HASH}.bin")
    if os.path.exists(path):
        with open(path, "rb") as fh:
            exp = jax.export.deserialize(fh.read())
        print(f"bench: export-cache hit {key}", file=sys.stderr)
        return exp.call
    t0 = time.perf_counter()
    exp = jax.export.export(fn)(*example_args)
    with open(path, "wb") as fh:
        fh.write(exp.serialize())
    print(f"bench: export-cache MISS {key} "
          f"(traced {time.perf_counter()-t0:.0f}s)", file=sys.stderr)
    return exp.call


#: Best previously captured value per section (BENCH_r04 artifact where
#: present, else the r4 full-bench rehearsal) — the per-section
#: plausibility cap is 3x this, far tighter than the roofline-multiple
#: cap for sub-30 us kernels (VERDICT r4: a 150x-roofline cap would
#: pass a 4x timing error).  Units: the section's recorded value.
_HISTORY = {
    "fused-tiled": 5.011e12, "fused-vmem": 3.390e11,
    "gather": 3.633e10, "replay-uniform": 2.585e11,
    "stream-hier": 2.424e11, "spill-uniform": 1.681e10,
    "config3-1M-gates": 3.611e10, "gather-bf16": 5.648e10,
    "mc-bitpacked": 2.928e11, "bdd-stream": 1.119e8,
    "replay-config3": 2.467e11,
}


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


#: Physical plausibility cap, in multiples of the gather-formulation HBM
#: roofline.  The VMEM-resident fused-tiled kernel legitimately reaches
#: ~19.5x (it eliminates the HBM traffic and runs at VPU rate, measured
#: BENCH_r02); 50x is beyond any physical engine on this chip and 4
#: orders of magnitude below the r3 clamp artifact (983,280x).
_CAP = 50.0

# Filled by main(); module-level so section functions can share them.
_sections: dict[str, dict] = {}
_failed: dict[str, str] = {}


def _record(name, value, unit, dt, iters_used):
    _sections[name] = {"value": value, "unit": unit,
                       "ms_per_iter": dt * 1e3, "iters": iters_used}


def measure(timed, iters, *, name, work=None, roofline=None, cap=_CAP,
            retries=3, hist=None):
    """Difference two iteration counts with validation.

    ``timed(n_iter)`` returns the best-of-3 wall time for ``n_iter``
    chained iterations.  The differenced span must exceed timer noise
    (2 ms and 2% of the small run) and, when ``work``/``roofline`` are
    given, the implied value must stay under ``cap`` x roofline AND
    under 3x the best previously captured value for this section
    (``hist``, default ``_HISTORY[name]`` — the r4 verdict's
    history-anchored cap: a roofline multiple alone would pass a 4x
    timing error on sub-30 us kernels).  Invalid timings retry with a
    doubled span (n_iter is traced — no recompile); persistent failure
    raises instead of publishing.
    """
    hist = _HISTORY.get(name) if hist is None else hist
    for attempt in range(retries):
        t_small = timed(2)
        t_large = timed(2 + iters)
        span = t_large - t_small
        if span >= max(2e-3, 0.02 * t_small):
            dt = span / iters
            value = None if work is None else work / dt
            if value is not None and hist is not None \
                    and value > 3.0 * hist:
                reason = (f"value {value:.3e} exceeds 3x the best "
                          f"prior capture {hist:.3e}")
            elif value is None or roofline is None \
                    or value <= cap * roofline:
                return dt, iters
            else:
                reason = (f"value {value:.3e} exceeds "
                          f"{cap:g}x roofline {roofline:.3e}")
        else:
            reason = (f"differenced span {span * 1e3:.3f} ms not "
                      f"resolvable over {iters} iters "
                      f"(small={t_small * 1e3:.1f} ms)")
        print(f"bench[{name}]: implausible timing ({reason}); "
              f"retrying with {iters * 2} iters", file=sys.stderr)
        iters *= 2
    raise RuntimeError(f"{name}: timing implausible after {retries} "
                       f"retries ({reason})")


def _best3(fn, *args):
    float(fn(*args))  # warmup/compile this variant
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _budget_s() -> float:
    """Whole-process wall budget (seconds), default 1560 — inside the
    ~30 min driver window with margin (BENCH_r04 was killed ~28+ min
    in with 8 sections unrun; the r5 warm rehearsal measured 23 min
    for all 18 sections)."""
    return float(os.environ.get("BENCH_BUDGET_S", "1560"))


def _remaining_s() -> float:
    return _budget_s() - (time.perf_counter() - _T0)


def run_section(name, timeout_s=900.0):
    """Run one section in an isolated SUBPROCESS (default).

    The rehearsal for BENCH_r04 showed that a single RESOURCE_EXHAUSTED
    poisons the tunneled TPU backend for the rest of the process —
    ``jax.clear_caches()`` + gc cannot recover it (every later section
    fails instantly).  A child process per section gives each section a
    fresh backend; its results ride back on a ``section-result:`` JSON
    line.  ``BENCH_SUBPROC=0`` runs in-process (CPU smoke tests).

    ``timeout_s`` is clamped to the remaining whole-process budget
    (minus a 45 s reserve for the final emissions), so no section can
    push the run past the driver's kill window.
    """
    if os.environ.get("BENCH_SUBPROC", "1") == "1":
        if _budget_s() >= 3600:
            # Rehearsal mode: one-time cold traces (the 65k adjoint is
            # ~17 min) may exceed the driver-window per-section caps.
            timeout_s = timeout_s * 4
        timeout_s = min(timeout_s, max(_remaining_s() - 45.0, 0.0))
        if timeout_s < 60.0:
            _failed[name] = "budget exhausted before start"
            print(f"bench[{name}] skipped: budget exhausted",
                  file=sys.stderr)
            return
    if os.environ.get("BENCH_SUBPROC", "1") != "1":
        import jax
        try:
            SECTION_RUNNERS[name]()
        except Exception as exc:
            _failed[name] = f"{type(exc).__name__}: {exc}"
            print(f"bench[{name}] skipped: {exc}", file=sys.stderr)
        finally:
            jax.clear_caches()
            gc.collect()
        return
    import subprocess
    env = dict(os.environ)
    env["BENCH_GATHER_VALUE"] = repr(
        _sections.get("gather", {}).get("value", 0.0))
    env["BENCH_BEST_VALUE"] = repr(max(
        (_sections.get(k, {}).get("value", 0.0)
         for k in ("gather", "fused-vmem", "fused-tiled")), default=0.0))
    try:
        proc = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__),
             "--section", name],
            stdout=subprocess.PIPE, stderr=None, env=env,
            timeout=timeout_s)
    except subprocess.TimeoutExpired:
        _failed[name] = f"section timed out after {timeout_s:.0f}s"
        print(f"bench[{name}] skipped: timeout", file=sys.stderr)
        return
    got = None
    for line in proc.stdout.decode(errors="replace").splitlines():
        if line.startswith("section-result: "):
            got = json.loads(line[len("section-result: "):])
    if got:
        _sections.update(got)
    if proc.returncode != 0 or not got:
        _failed[name] = (f"exit {proc.returncode}"
                         if proc.returncode else "no result line")
        print(f"bench[{name}] failed: {_failed[name]}", file=sys.stderr)


# ---------------------------------------------------------------------------
# Sections.  Each owns its arrays; locals die on return.


def sec_fused_tiled(rng, dtype, roofline):
    import jax
    import jax.numpy as jnp
    from canopy_tpu.ops.pallas_kernels import (
        fused_propagate_tiled_staged, tile_trials)
    from canopy_tpu.utils.synthetic import synthetic_compiled_tree

    tiled_gates = int(os.environ.get("BENCH_TILED_GATES", "2048"))
    tiled_trials = int(os.environ.get("BENCH_TILED_TRIALS", "8192"))
    tree_t = synthetic_compiled_tree(n_basic=1024, n_gates=tiled_gates,
                                     fanin=8, n_levels=8, seed=0)
    basic_t = jnp.asarray(
        rng.uniform(0.0, 0.05, (tiled_trials, tree_t.n_basic)),
        dtype=dtype)
    no_house_t = np.zeros(0, np.float32)
    # Kernel-only measurement: tile the input once (the layout transform
    # costs ~3x the kernel), then carry it through the loop perturbing
    # one (8, 128) tile per iteration — the body is genuinely
    # loop-variant, so XLA cannot hoist the kernel call.
    staged_t = jax.jit(tile_trials)(basic_t)

    @jax.jit
    def repeat_tiled(s, n_iter):
        def body(i, carry):
            acc, s = carry
            s = jax.lax.dynamic_update_index_in_dim(
                s, s[0] * (1.0 + 1e-9), 0, axis=0)
            out = fused_propagate_tiled_staged(tree_t, s, no_house_t)
            return (acc + out.sum(), s)
        acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                   (jnp.asarray(0.0, dtype), s))
        return acc

    # VMEM-resident VPU kernel: legitimately tens of x the HBM roofline
    # (sub-30 us/iter; run-to-run tunnel jitter needs the wide span).
    # VERDICT r4 item 7: a headline that moved 2x on a toolchain change
    # needs in-artifact corroboration — measure at THREE pinned spans
    # and publish the median with the spread (one compile serves all
    # spans; n_iter is traced).
    spans = [int(s) for s in os.environ.get(
        "BENCH_TILED_SPANS", "512,2048,8192").split(",")]
    work_t = tree_t.nnz * tiled_trials
    per_span = []
    for sp in spans:
        dt, used = measure(
            lambda n: _best3(repeat_tiled, staged_t, n), sp,
            name="fused-tiled", work=work_t, roofline=roofline,
            cap=150.0)
        per_span.append((used, dt, work_t / dt))
    per_span_v = sorted(v for _u, _d, v in per_span)
    value = per_span_v[len(per_span_v) // 2]          # median
    dt = work_t / value
    _record("fused-tiled", value, "nnz*trials/s", dt,
            [u for u, _d, _v in per_span])
    _sections["fused-tiled"]["spread"] = {
        f"span{u}": round(v, 3) for u, _d, v in per_span}
    lo, hi = per_span_v[0], per_span_v[-1]
    print(f"bench[fused-tiled {tiled_gates}g]: median {dt*1e3:.3f} "
          f"ms/iter, {value/1e9:.2f} Gnnz*trials/s; spans "
          + ", ".join(f"{u}it={v/1e9:.2f}G" for u, _d, v in per_span)
          + f" (spread {hi/max(lo,1e-30):.2f}x)", file=sys.stderr)


def sec_fused_vmem(rng, dtype, roofline, fanin):
    import jax
    import jax.numpy as jnp
    from canopy_tpu.ops.pallas_kernels import fused_propagate
    from canopy_tpu.utils.synthetic import synthetic_compiled_tree

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
        def body(i, carry):
            acc, p = carry
            p = p.at[:, :1].mul(1.0 + 1e-9)
            out = fused_propagate(tree_f, p, no_house)
            return (acc + out.sum(), p)
        acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                   (jnp.asarray(0.0, dtype), p))
        return acc

    f_iters = int(os.environ.get("BENCH_FUSED_ITERS", "64"))
    dt, f_iters = measure(
        lambda n: _best3(repeat_fused, basic_f, n), f_iters,
        name="fused-vmem", work=tree_f.nnz * fused_trials,
        roofline=roofline)
    value = tree_f.nnz * fused_trials / dt
    _record("fused-vmem", value, "nnz*trials/s", dt, f_iters)
    print(f"bench[fused-vmem {fused_gates}g]: {dt*1e3:.2f} ms/iter, "
          f"{value/1e9:.2f} Gnnz*trials/s", file=sys.stderr)


def sec_gather(rng, dtype, roofline, tree, n_trials, iters):
    import jax
    import jax.numpy as jnp
    from canopy_tpu.engine.propagate import top_event_probability

    house = jnp.zeros((0,), dtype=dtype)
    basic_p = jnp.asarray(
        rng.uniform(0.0, 0.05, (n_trials, tree.n_basic)), dtype=dtype)

    @jax.jit
    def repeat_step(p, n_iter):
        def body(i, carry):
            acc, p = carry
            p = p.at[:, :1].mul(1.0 + 1e-9)
            return (acc + top_event_probability(tree, p, house).sum(), p)
        acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                   (jnp.asarray(0.0, dtype), p))
        return acc

    dt, iters = measure(
        lambda n: _best3(repeat_step, basic_p, n), iters,
        name="gather", work=tree.nnz * n_trials, roofline=roofline)
    value = tree.nnz * n_trials / dt
    _record("gather", value, "nnz*trials/s", dt, iters)
    print(f"bench[gather {tree.n_gates}g]: {dt*1e3:.2f} ms/iter, "
          f"{value/1e9:.2f} Gnnz*trials/s, roofline "
          f"{roofline/1e9:.2f} G/s, fraction {value/roofline:.3f}",
          file=sys.stderr)


def sec_adjoint(rng, dtype, roofline):
    """Importance backward: the adjoint stream program vs XLA autodiff
    through the gather engine, at the criterion size — the 9,363-gate
    plant-shaped tree (BASELINE.md:36; BENCH_ADJ_BASICS=65536)."""
    import jax
    import jax.numpy as jnp
    from canopy_tpu.engine.propagate import top_event_probability
    from canopy_tpu.ops.adjoint_kernel import (
        compile_adjoint, make_differentiable_stream)
    from canopy_tpu.ops.stream_kernel import (compile_stream, stage_basic,
                                              unstage_basic)
    from canopy_tpu.utils.synthetic import synthetic_hierarchical_tree

    adj_basics = int(os.environ.get("BENCH_ADJ_BASICS", "65536"))
    adj_trials = 1024
    tree_a = host_cached(
        f"hier-{adj_basics}b-s128",
        lambda: synthetic_hierarchical_tree(
            n_basic=adj_basics, branching=8, share_fraction=0.1,
            n_shared=128, seed=0))
    program_a = host_cached(f"stream-{adj_basics}b-s128",
                            lambda: compile_stream(tree_a))
    aprog_a = host_cached(f"adjoint-{adj_basics}b-s128",
                          lambda: compile_adjoint(program_a))
    house_a = np.zeros(0, np.float32)
    f_a = make_differentiable_stream(aprog_a, house_a)
    basic_a = jnp.asarray(
        rng.uniform(0.0, 0.05, (adj_trials, tree_a.n_basic)), dtype)
    staged_a = jax.jit(lambda p: stage_basic(program_a, p))(basic_a)

    grad_stream = exported_cached(
        f"grad-stream-{adj_basics}b",
        jax.jit(jax.value_and_grad(lambda s: f_a(s).sum())), staged_a)
    grad_gather = exported_cached(
        f"grad-gather-{adj_basics}b",
        jax.jit(jax.value_and_grad(
            lambda p: top_event_probability(
                tree_a, p, jnp.asarray(house_a)).sum())), basic_a)

    # Identical anti-hoisting on both sides: carry the input, perturb
    # one tile/column per iteration (a few KB — does not mask either
    # kernel).
    @jax.jit
    def repeat_gs(s, n_iter):
        def body(i, carry):
            acc, s = carry
            s = jax.lax.dynamic_update_index_in_dim(
                s, s[0] * (1.0 + 1e-9), 0, axis=0)
            v, g = jax.value_and_grad(lambda x: f_a(x).sum())(s)
            return (acc + v + g.sum(), s)
        acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                   (jnp.asarray(0.0, dtype), s))
        return acc

    @jax.jit
    def repeat_gg(p, n_iter):
        def body(i, carry):
            acc, p = carry
            p = p.at[:, :1].mul(1.0 + 1e-9)
            v, g = jax.value_and_grad(lambda x: top_event_probability(
                tree_a, x, jnp.asarray(house_a)).sum())(p)
            return (acc + v + g.sum(), p)
        acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                   (jnp.asarray(0.0, dtype), p))
        return acc

    repeat_gs = exported_cached(f"rep-adj-stream-{adj_basics}b",
                                repeat_gs, staged_a, 2)
    repeat_gg = exported_cached(f"rep-adj-gather-{adj_basics}b",
                                repeat_gg, basic_a, 2)
    a_iters = int(os.environ.get("BENCH_ADJ_ITERS", "64"))
    as_dt, a_iters = measure(
        lambda n: _best3(repeat_gs, staged_a, n), a_iters,
        name="adjoint-stream-vjp", work=tree_a.nnz * adj_trials,
        roofline=roofline)
    ag_iters = max(a_iters // 8, 8)
    ag_dt, ag_iters = measure(
        lambda n: _best3(repeat_gg, basic_a, n), ag_iters,
        name="gather-autodiff-vjp", work=tree_a.nnz * adj_trials,
        roofline=roofline)
    # Gradient agreement on hardware (value_and_grad both paths).
    v_s, g_s = grad_stream(staged_a)
    v_g, g_g = grad_gather(basic_a)
    g_s_un = np.asarray(unstage_basic(program_a, g_s))
    rel_g = float(np.max(np.abs(g_s_un - np.asarray(g_g))
                         / np.maximum(np.abs(np.asarray(g_g)), 1e-20)))
    _record("adjoint-stream-vjp", tree_a.nnz * adj_trials / as_dt,
            "nnz*trials/s fwd+bwd", as_dt, a_iters)
    _record("gather-autodiff-vjp", tree_a.nnz * adj_trials / ag_dt,
            "nnz*trials/s fwd+bwd", ag_dt, ag_iters)
    print(f"bench[adjoint {tree_a.n_gates}g]: stream fwd+bwd "
          f"{as_dt*1e3:.3f} ms/iter vs gather autodiff "
          f"{ag_dt*1e3:.2f} ms/iter -> {ag_dt/as_dt:.1f}x "
          f"(max rel grad err {rel_g:.1e})", file=sys.stderr)


def sec_stream(rng, dtype, roofline):
    import jax
    import jax.numpy as jnp
    from canopy_tpu.ops.stream_kernel import (compile_stream, stage_basic,
                                              stream_propagate_staged)
    from canopy_tpu.utils.synthetic import synthetic_hierarchical_tree

    s_basics = int(os.environ.get("BENCH_STREAM_BASICS", "65536"))
    s_trials = int(os.environ.get("BENCH_STREAM_TRIALS", "2048"))
    tree_s = host_cached(
        f"hier-{s_basics}b-s256",
        lambda: synthetic_hierarchical_tree(
            n_basic=s_basics, branching=8, share_fraction=0.1,
            n_shared=256, seed=0))
    program_s = host_cached(f"stream-{s_basics}b-s256",
                            lambda: compile_stream(tree_s))
    basic_s = jnp.asarray(
        rng.uniform(0.0, 0.05, (s_trials, tree_s.n_basic)), dtype)
    staged = jax.jit(lambda p: stage_basic(program_s, p))(basic_s)
    house_s = np.zeros(0, np.float32)

    @jax.jit
    def repeat_stream(s, n_iter):
        def body(i, carry):
            acc, s = carry
            s = jax.lax.dynamic_update_index_in_dim(
                s, s[0] * (1.0 + 1e-9), 0, axis=0)
            v = stream_propagate_staged(program_s, s, house_s)
            return (acc + v.sum(), s)
        acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                   (jnp.asarray(0.0, dtype), s))
        return acc

    repeat_stream = exported_cached(f"rep-stream-{s_basics}b",
                                    repeat_stream, staged, 2)
    s_iters = int(os.environ.get("BENCH_STREAM_ITERS", "256"))
    s_dt, s_iters = measure(
        lambda n: _best3(repeat_stream, staged, n), s_iters,
        name="stream-hier", work=program_s.nnz * s_trials,
        roofline=roofline)
    s_value = program_s.nnz * s_trials / s_dt
    _record("stream-hier", s_value, "nnz*trials/s", s_dt, s_iters)
    dma_bytes = (program_s.n_chunks * program_s.chunk_tiles
                 * (s_trials // 1024) * 4096)
    hbm = _hbm_bandwidth_bytes()
    print(f"bench[stream {tree_s.n_gates}g hier]: {s_dt*1e3:.3f} ms/"
          f"iter, {s_value/1e9:.2f} Gnnz*trials/s, DMA "
          f"{dma_bytes/1e6:.0f} MB -> {dma_bytes/1e9/s_dt:.0f} GB/s "
          f"({dma_bytes/1e9/s_dt/(hbm/1e9):.2f} of HBM)",
          file=sys.stderr)


def sec_replay(rng, dtype, roofline, fanin):
    """The replay-stream engine on the 65k-gate *uniform* tree — the
    thrashing access pattern that was the declared north-star miss
    (gather 0.27, spill tier 0.12 of roofline).  All refill traffic
    rides sequential replay streams (compiler/replay.py)."""
    import jax
    import jax.numpy as jnp
    from canopy_tpu.compiler.replay import build_replay_schedule
    from canopy_tpu.engine.propagate import top_event_probability
    from canopy_tpu.ops.stream_kernel import (replay_propagate_staged,
                                              stage_replay)
    from canopy_tpu.utils.synthetic import synthetic_compiled_tree

    rp_gates = int(os.environ.get("BENCH_REPLAY_GATES", "65536"))
    rp_trials = int(os.environ.get("BENCH_REPLAY_TRIALS", "4096"))
    tree_rp = host_cached(
        f"tree-{rp_gates}g-f{fanin}",
        lambda: synthetic_compiled_tree(n_basic=8192, n_gates=rp_gates,
                                        fanin=fanin, n_levels=14,
                                        seed=0))
    program_rp = host_cached(f"replay-{rp_gates}g-f{fanin}",
                             lambda: build_replay_schedule(tree_rp))
    basic_rp = jnp.asarray(
        rng.uniform(0.0, 0.05, (rp_trials, tree_rp.n_basic)), dtype)
    brs = jax.jit(lambda p: stage_replay(program_rp, p))(basic_rp)
    house_rp = np.zeros(0, np.float32)

    @jax.jit
    def repeat_replay(b, n_iter):
        def body(i, carry):
            acc, b = carry
            b = jax.lax.dynamic_update_index_in_dim(
                b, b[0] * (1.0 + 1e-9), 0, axis=0)
            v = replay_propagate_staged(program_rp, b, house_rp)
            return (acc + v.sum(), b)
        acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                   (jnp.asarray(0.0, dtype), b))
        return acc

    repeat_replay = exported_cached(
        f"rep-replay-{rp_gates}g-T{rp_trials}", repeat_replay, brs, 2)

    # Correctness on hardware FIRST (jitted: eager level evaluation of
    # the 65k gather reference materializes per-level (G, F, T) gather
    # intermediates and OOMs next to the timing executables), then the
    # check arrays are dropped before the timing loop compiles.
    check_fn = exported_cached(
        f"check-replay-{rp_gates}g-T{rp_trials}",
        jax.jit(lambda b: replay_propagate_staged(
            program_rp, b, house_rp)), brs)
    check = np.asarray(check_fn(brs))
    ref = np.asarray(jax.jit(lambda p: top_event_probability(
        tree_rp, p, jnp.asarray(house_rp)))(basic_rp), np.float32)
    rel = float(np.max(np.abs(check - ref) / np.maximum(ref, 1e-30)))
    del check, ref
    jax.clear_caches()

    rp_iters = int(os.environ.get("BENCH_REPLAY_ITERS", "256"))
    rp_dt, rp_iters = measure(
        lambda n: _best3(repeat_replay, brs, n), rp_iters,
        name="replay-uniform", work=program_rp.nnz * rp_trials,
        roofline=roofline)
    rp_value = program_rp.nnz * rp_trials / rp_dt
    _record("replay-uniform", rp_value, "nnz*trials/s", rp_dt, rp_iters)
    # Coalesced-stream DMA accounting per trial-tile: brs reads, grs
    # gather (read+write+stream read), eviction flushes, boundary
    # dump/loads, plus single-tile intra refills.
    n_inter = program_rp.n_inter
    tiles = (program_rp.brs_len_pad + 3 * n_inter + program_rp.n_evicted
             + 2 * (len(program_rp.segments) - 1) * program_rp.pool_slots)
    rp_bytes = tiles * 4096 * (rp_trials // 1024)
    hbm = _hbm_bandwidth_bytes()
    print(f"bench[replay {tree_rp.n_gates}g uniform]: "
          f"{rp_dt*1e3:.3f} ms/iter, {rp_value/1e9:.2f} Gnnz*trials/s "
          f"= {rp_value/roofline:.2f} of the gather-formulation "
          f"roofline ({len(program_rp.segments)} segments, "
          f"{program_rp.n_evicted} evicted, {program_rp.n_intra} intra, "
          f"{n_inter} inter, {program_rp.n_slab_reads} slab; stream DMA "
          f"{rp_bytes/1e6:.0f} MB -> {rp_bytes/1e9/rp_dt:.0f} GB/s = "
          f"{rp_bytes/1e9/rp_dt/(hbm/1e9):.2f} of HBM; max rel err vs "
          f"gather {rel:.1e})", file=sys.stderr)


def sec_spill(rng, dtype, roofline, fanin):
    """The spill-tier stream engine on the 65k-gate *uniform* tree — the
    access pattern whose live set rejects the plain stream pool."""
    import jax
    import jax.numpy as jnp
    from canopy_tpu.compiler.spill import build_spill_schedule
    from canopy_tpu.engine.propagate import top_event_probability
    from canopy_tpu.ops.stream_kernel import (spill_propagate_staged,
                                              stage_basic)
    from canopy_tpu.utils.synthetic import synthetic_compiled_tree

    sp_gates = int(os.environ.get("BENCH_SPILL_GATES", "65536"))
    sp_trials = int(os.environ.get("BENCH_SPILL_TRIALS", "4096"))
    tree_sp = host_cached(
        f"tree-{sp_gates}g-f{fanin}",
        lambda: synthetic_compiled_tree(n_basic=8192, n_gates=sp_gates,
                                        fanin=fanin, n_levels=14,
                                        seed=0))
    program_sp = host_cached(f"spill-{sp_gates}g-f{fanin}",
                             lambda: build_spill_schedule(tree_sp))
    basic_sp = jnp.asarray(
        rng.uniform(0.0, 0.05, (sp_trials, tree_sp.n_basic)), dtype)
    staged_sp = jax.jit(lambda p: stage_basic(program_sp, p))(basic_sp)
    house_sp = np.zeros(0, np.float32)

    @jax.jit
    def repeat_spill(s, n_iter):
        def body(i, carry):
            acc, s = carry
            s = jax.lax.dynamic_update_index_in_dim(
                s, s[0] * (1.0 + 1e-9), 0, axis=0)
            v = spill_propagate_staged(program_sp, s, house_sp)
            return (acc + v.sum(), s)
        acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                   (jnp.asarray(0.0, dtype), s))
        return acc

    repeat_spill = exported_cached(f"rep-spill-{sp_gates}g",
                                   repeat_spill, staged_sp, 2)
    sp_iters = int(os.environ.get("BENCH_SPILL_ITERS", "64"))
    sp_dt, sp_iters = measure(
        lambda n: _best3(repeat_spill, staged_sp, n), sp_iters,
        name="spill-uniform", work=program_sp.nnz * sp_trials,
        roofline=roofline)
    sp_value = program_sp.nnz * sp_trials / sp_dt
    _record("spill-uniform", sp_value, "nnz*trials/s", sp_dt, sp_iters)
    # DMA accounting per trial-tile step: staged chunk reads (incl.
    # per-segment re-staging), eviction flushes, refills, boundary
    # dump/loads — the bytes the schedule actually moves.
    flat_sp = [op for seg in program_sp.segments for op in seg]
    tiles_moved = (
        sum(program_sp.chunk_tiles for op in flat_sp if op[0] == "start")
        + sum(1 for op in flat_sp if op[0] in ("evict", "rstart"))
        + sum(program_sp.pool_slots for op in flat_sp
              if op[0] in ("dstart", "lstart")))
    sp_bytes = tiles_moved * 4096 * (sp_trials // 1024)
    # Correctness on hardware: one batch vs the gather engine (same
    # tree, same house vector; jitted to keep level intermediates
    # fused).
    check = np.asarray(exported_cached(
        f"check-spill-{sp_gates}g",
        jax.jit(lambda s: spill_propagate_staged(
            program_sp, s, house_sp)), staged_sp)(staged_sp))
    ref = np.asarray(jax.jit(lambda p: top_event_probability(
        tree_sp, p, jnp.asarray(house_sp)))(basic_sp), np.float32)
    rel = float(np.max(np.abs(check - ref) / np.maximum(ref, 1e-30)))
    hbm = _hbm_bandwidth_bytes()
    print(f"bench[spill {tree_sp.n_gates}g uniform]: "
          f"{sp_dt*1e3:.3f} ms/iter, {sp_value/1e9:.2f} "
          f"Gnnz*trials/s = {sp_value/roofline:.2f} of the "
          f"gather-formulation roofline "
          f"({len(program_sp.segments)} segments, "
          f"{program_sp.n_evicted} evicted, "
          f"{program_sp.n_refills} refills; DMA "
          f"{sp_bytes/1e6:.0f} MB -> {sp_bytes/1e9/sp_dt:.0f} GB/s = "
          f"{sp_bytes/1e9/sp_dt/(hbm/1e9):.2f} of HBM; "
          f"max rel err vs gather {rel:.1e})", file=sys.stderr)


def sec_replay_adjoint(rng, dtype, roofline, fanin):
    """Importance backward at spill scale: the replay engine's adjoint
    (compiler/replay_adjoint.py) vs XLA autodiff through the gather
    engine on a pool-thrashing uniform tree (the r3 gap: these trees
    had no kernel-speed importance path)."""
    import jax
    import jax.numpy as jnp
    from canopy_tpu.compiler.replay_adjoint import build_replay_adjoint
    from canopy_tpu.engine.propagate import top_event_probability
    from canopy_tpu.ops.replay_adjoint_kernel import \
        make_differentiable_replay
    from canopy_tpu.ops.stream_kernel import (replay_grad_basic,
                                              stage_replay)
    from canopy_tpu.utils.synthetic import synthetic_compiled_tree

    ra_gates = int(os.environ.get("BENCH_RADJ_GATES", "16384"))
    ra_trials = 1024
    tree_ra = host_cached(
        f"tree-{ra_gates}g-f{fanin}",
        lambda: synthetic_compiled_tree(n_basic=8192, n_gates=ra_gates,
                                        fanin=fanin, n_levels=14,
                                        seed=0))
    ra_bwd = int(os.environ.get("BENCH_RADJ_BWD_OPS", "12288"))
    ra_pool = int(os.environ.get("BENCH_RADJ_POOL", "0"))
    ra_kw = dict(max_ops_per_segment=2048, max_bwd_ops=ra_bwd)
    if ra_pool:
        ra_kw["pool_slots"] = ra_pool
    aprog = host_cached(
        f"radj-{ra_gates}g-f{fanin}-s2048-b{ra_bwd}-p{ra_pool}",
        lambda: build_replay_adjoint(tree_ra, **ra_kw))
    b = aprog.base
    house_ra = np.zeros(0, np.float32)
    f_ra = make_differentiable_replay(aprog, house_ra)
    basic_ra = jnp.asarray(
        rng.uniform(0.0, 0.05, (ra_trials, tree_ra.n_basic)), dtype)
    brs_ra = jax.jit(lambda p: stage_replay(b, p))(basic_ra)

    @jax.jit
    def rep_s(s, n_iter):
        def body(i, carry):
            acc, s = carry
            s = jax.lax.dynamic_update_index_in_dim(
                s, s[0] * (1.0 + 1e-9), 0, axis=0)
            v, g = jax.value_and_grad(lambda x: f_ra(x).sum())(s)
            return (acc + v + g.sum(), s)
        acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                   (jnp.asarray(0.0, dtype), s))
        return acc

    @jax.jit
    def rep_g(p, n_iter):
        def body(i, carry):
            acc, p = carry
            p = p.at[:, :1].mul(1.0 + 1e-9)
            v, g = jax.value_and_grad(lambda y: top_event_probability(
                tree_ra, y, jnp.asarray(house_ra)).sum())(p)
            return (acc + v + g.sum(), p)
        acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                   (jnp.asarray(0.0, dtype), p))
        return acc

    rep_s = exported_cached(f"rep-radj-{ra_gates}g", rep_s, brs_ra, 2)
    rep_g = exported_cached(f"rep-radj-gather-{ra_gates}g", rep_g,
                            basic_ra, 2)
    ra_iters = int(os.environ.get("BENCH_RADJ_ITERS", "32"))
    s_dt, ra_iters = measure(
        lambda n: _best3(rep_s, brs_ra, n), ra_iters,
        name="replay-adjoint-vjp", work=b.nnz * ra_trials,
        roofline=roofline)
    g_dt, g_iters = measure(
        lambda n: _best3(rep_g, basic_ra, n), max(ra_iters // 4, 8),
        name="gather-autodiff-on-thrash", work=b.nnz * ra_trials,
        roofline=roofline)
    # Gradient agreement on hardware.
    v_s, g_s = exported_cached(
        f"grad-radj-{ra_gates}g",
        jax.jit(jax.value_and_grad(
            lambda s: f_ra(s).sum())), brs_ra)(brs_ra)
    v_g, g_g = exported_cached(
        f"grad-radj-gather-{ra_gates}g",
        jax.jit(jax.value_and_grad(
            lambda x: top_event_probability(
                tree_ra, x, jnp.asarray(house_ra)).sum())),
        basic_ra)(basic_ra)
    gb = np.asarray(replay_grad_basic(b, g_s, ra_trials))
    gg = np.asarray(g_g)
    rel = float(np.max(np.abs(gb - gg))) / max(float(np.max(np.abs(gg))),
                                               1e-300)
    suffix = "" if ra_gates == 16384 else f"-{ra_gates // 1024}k"
    _record(f"replay-adjoint-vjp{suffix}", b.nnz * ra_trials / s_dt,
            "nnz*trials/s fwd+bwd", s_dt, ra_iters)
    _record(f"gather-autodiff-on-thrash{suffix}",
            b.nnz * ra_trials / g_dt,
            "nnz*trials/s fwd+bwd", g_dt, g_iters)
    _sections[f"replay-adjoint-vjp{suffix}"]["speedup_vs_gather"] = \
        round(g_dt / s_dt, 2)
    print(f"bench[replay-adjoint {tree_ra.n_gates}g thrash]: fwd+bwd "
          f"{s_dt*1e3:.3f} ms/iter vs gather autodiff "
          f"{g_dt*1e3:.2f} ms/iter -> {g_dt/s_dt:.1f}x "
          f"({b.n_evicted} evictions; max grad err/|g|max {rel:.1e})",
          file=sys.stderr)


def sec_config3(rng, dtype, roofline, fanin):
    """Config-3 scale: the 1M-gate synthetic on one chip
    (BASELINE.md:36).  Index arrays ride as jit ARGUMENTS
    (make_param_propagator): baked-in constants would ship ~30 MB in
    every remote-compile request (HTTP 413 on tunneled devices)."""
    import jax
    import jax.numpy as jnp
    from canopy_tpu.engine.propagate import make_param_propagator
    from canopy_tpu.utils.synthetic import synthetic_compiled_tree

    m_gates = int(os.environ.get("BENCH_M_GATES", "1000000"))
    m_trials = int(os.environ.get("BENCH_M_TRIALS", "1024"))
    tree_m = host_cached(
        f"tree1m-{m_gates}g-f{fanin}",
        lambda: synthetic_compiled_tree(n_basic=65536, n_gates=m_gates,
                                        fanin=fanin, n_levels=14,
                                        seed=0))
    fn_m, params_m = make_param_propagator(tree_m)
    params_m = jax.device_put(params_m)
    basic_m = jnp.asarray(
        rng.uniform(0.0, 0.05, (m_trials, tree_m.n_basic)), dtype)
    house_m = jnp.zeros((0,), dtype)

    @jax.jit
    def repeat_m(params, p, n_iter):
        def body(i, carry):
            acc, p = carry
            p = p.at[:, :1].mul(1.0 + 1e-9)
            return (acc + fn_m(params, p, house_m).sum(), p)
        acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                   (jnp.asarray(0.0, dtype), p))
        return acc

    repeat_m = exported_cached(f"rep-config3-{m_gates}g", repeat_m,
                               params_m, basic_m, 2)
    m_iters = int(os.environ.get("BENCH_M_ITERS", "8"))
    m_dt, m_iters = measure(
        lambda n: _best3(repeat_m, params_m, basic_m, n), m_iters,
        name="config3-1M-gates", work=tree_m.nnz * m_trials,
        roofline=roofline)
    m_value = tree_m.nnz * m_trials / m_dt
    _record("config3-1M-gates", m_value, "nnz*trials/s", m_dt, m_iters)
    print(f"bench[config3 {tree_m.n_gates}g 1M]: {m_dt*1e3:.2f} ms/"
          f"iter, {m_value/1e9:.2f} Gnnz*trials/s = "
          f"{m_value/roofline:.3f} of the gather-formulation "
          f"roofline (nnz={tree_m.nnz}, T={m_trials})", file=sys.stderr)


def sec_replay_config3(rng, dtype, roofline, fanin):
    """The replay engine at full config-3 scale (1M gates): the DFS
    schedule dead-code-eliminates the ~950k gates outside the top cone
    and streams the rest — dev r04 measured 0.796 ms/iter = 142x the
    gather engine on the same tree, never before in a driver artifact.
    ``engine="replay"`` is explicit here (tree nnz 4M exceeds the 2M
    auto-dispatch compile-surprise cap)."""
    import jax
    import jax.numpy as jnp
    from canopy_tpu.compiler.replay import build_replay_schedule
    from canopy_tpu.ops.stream_kernel import (replay_propagate_staged,
                                              stage_replay)
    from canopy_tpu.utils.synthetic import synthetic_compiled_tree

    rc_gates = int(os.environ.get("BENCH_RC3_GATES", "1000000"))
    rc_trials = int(os.environ.get("BENCH_RC3_TRIALS", "1024"))
    tree_rc = host_cached(
        f"tree1m-{rc_gates}g-f{fanin}",
        lambda: synthetic_compiled_tree(n_basic=65536, n_gates=rc_gates,
                                        fanin=fanin, n_levels=14,
                                        seed=0))
    program_rc = host_cached(f"replay-cfg3-{rc_gates}g-f{fanin}",
                             lambda: build_replay_schedule(tree_rc))
    basic_rc = jnp.asarray(
        rng.uniform(0.0, 0.05, (rc_trials, tree_rc.n_basic)), dtype)
    brs_rc = jax.jit(lambda p: stage_replay(program_rc, p))(basic_rc)
    house_rc = np.zeros(0, np.float32)

    @jax.jit
    def repeat_rc(b, n_iter):
        def body(i, carry):
            acc, b = carry
            b = jax.lax.dynamic_update_index_in_dim(
                b, b[0] * (1.0 + 1e-9), 0, axis=0)
            v = replay_propagate_staged(program_rc, b, house_rc)
            return (acc + v.sum(), b)
        acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                   (jnp.asarray(0.0, dtype), b))
        return acc

    repeat_rc = exported_cached(f"rep-rc3-{rc_gates}g", repeat_rc,
                                brs_rc, 2)
    rc_iters = int(os.environ.get("BENCH_RC3_ITERS", "256"))
    rc_dt, rc_iters = measure(
        lambda n: _best3(repeat_rc, brs_rc, n), rc_iters,
        name="replay-config3", work=program_rc.nnz * rc_trials,
        roofline=roofline)
    rc_value = program_rc.nnz * rc_trials / rc_dt
    _record("replay-config3", rc_value, "nnz*trials/s", rc_dt, rc_iters)
    print(f"bench[replay-config3 {tree_rc.n_gates}g]: "
          f"{rc_dt*1e3:.3f} ms/iter over the "
          f"{program_rc.nnz}-nnz top cone, {rc_value/1e9:.2f} "
          f"Gnnz*trials/s ({len(program_rc.segments)} segments, "
          f"{program_rc.n_evicted} evicted)", file=sys.stderr)


def sec_auto400k(rng, dtype, roofline, fanin):
    """The PUBLIC auto-dispatch path at the 400k headline scale: the
    propagator's identity-keyed staging cache must deliver the staged
    replay kernel on repeat calls, not 49 ms of per-call re-staging
    (VERDICT r4 item 4).  Protocol: one warm call stages; then the
    marginal cost of N pipelined repeat calls on the same array is
    differenced against a single call, and compared to the staged
    kernel's chained-loop time.  The repeat calls dispatch through the
    un-jitted dispatcher, so this measures what a hot analysis loop
    actually gets."""
    import jax
    import jax.numpy as jnp
    from canopy_tpu.engine.propagate import make_propagator
    from canopy_tpu.ops.stream_kernel import (compile_replay_stream,
                                              replay_propagate_staged,
                                              stage_replay)
    from canopy_tpu.utils.synthetic import synthetic_compiled_tree

    au_gates = int(os.environ.get("BENCH_AUTO_GATES", "400000"))
    au_trials = int(os.environ.get("BENCH_AUTO_TRIALS", "2048"))
    tree_au = host_cached(
        f"tree-{au_gates}g-f{fanin}",
        lambda: synthetic_compiled_tree(n_basic=8192, n_gates=au_gates,
                                        fanin=fanin, n_levels=14,
                                        seed=0))
    basic_au = jnp.asarray(
        rng.uniform(0.0, 0.05, (au_trials, tree_au.n_basic)), dtype)
    fn = make_propagator(tree_au)          # auto: routes to replay

    # Staged-kernel reference on the same program (chained fori_loop —
    # the only honest sub-ms timing through the tunnel).
    program_au = host_cached(
        f"replay-{au_gates}g-f{fanin}",
        lambda: compile_replay_stream(tree_au))
    house_au = np.zeros(0, np.float32)
    stage_j = exported_cached(
        f"auto-stage-{au_gates}g",
        jax.jit(lambda p: stage_replay(program_au, p)), basic_au)
    brs_au = stage_j(basic_au)

    @jax.jit
    def repeat_au(b, n_iter):
        def body(i, carry):
            acc, b = carry
            b = jax.lax.dynamic_update_index_in_dim(
                b, b[0] * (1.0 + 1e-9), 0, axis=0)
            v = replay_propagate_staged(program_au, b, house_au)
            return (acc + v.sum(), b)
        acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                   (jnp.asarray(0.0, dtype), b))
        return acc

    repeat_au = exported_cached(f"rep-auto-{au_gates}g", repeat_au,
                                brs_au, 2)
    k_iters = int(os.environ.get("BENCH_AUTO_ITERS", "128"))
    k_dt, k_iters = measure(
        lambda n: _best3(repeat_au, brs_au, n), k_iters,
        name="auto-400k-kernel", work=program_au.nnz * au_trials,
        roofline=roofline, hist=_HISTORY.get("replay-config3"))

    # Correctness of the dispatcher + cache invalidation: a second,
    # different array must re-stage (values match a fresh staged eval).
    # References ride the export cache (each un-exported jit here would
    # re-trace the 13-segment 400k program for minutes per run).
    check_j = exported_cached(
        f"auto-check-{au_gates}g",
        jax.jit(lambda b: replay_propagate_staged(
            program_au, b, house_au)), brs_au)
    r1 = np.asarray(fn(basic_au))
    ref1 = np.asarray(check_j(brs_au))
    basic_au2 = basic_au.at[:, 0].mul(1.5)
    r2 = np.asarray(fn(basic_au2))
    ref2 = np.asarray(check_j(stage_j(basic_au2)))
    ok = np.array_equal(r1, ref1) and np.array_equal(r2, ref2)

    # Marginal repeat-call cost: T(1+N) - T(1) over N, best of 3, all
    # calls after the stage (the first fn(basic_au) above staged it;
    # r2's call re-staged for basic_au2 — re-prime on basic_au).
    def t_calls(n):
        fn(basic_au).block_until_ready()   # prime the cache entry
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _i in range(n):
                out = fn(basic_au)
            out.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best
    reps = int(os.environ.get("BENCH_AUTO_REPS", "64"))
    m_dt = (t_calls(1 + reps) - t_calls(1)) / reps
    ratio = m_dt / k_dt
    value = program_au.nnz * au_trials / m_dt
    _record("auto-400k", value, "nnz*trials/s marginal", m_dt, reps)
    _sections["auto-400k"]["kernel_ms"] = round(k_dt * 1e3, 4)
    _sections["auto-400k"]["ratio_vs_kernel"] = round(ratio, 3)
    _sections["auto-400k"]["bit_exact"] = bool(ok)
    print(f"bench[auto-400k {tree_au.n_gates}g]: staged kernel "
          f"{k_dt*1e3:.3f} ms/iter; public auto-dispatch marginal "
          f"{m_dt*1e3:.3f} ms/call over {reps} pipelined repeat calls "
          f"= {ratio:.2f}x the kernel (cache invalidation "
          f"{'bit-exact' if ok else 'MISMATCH'})", file=sys.stderr)


def sec_bdd_stream(rng, dtype, roofline):
    """Exact-BDD streaming evaluation (one fused Shannon mux per node)."""
    import jax
    import jax.numpy as jnp
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
        def body(i, carry):
            acc, s = carry
            s = jax.lax.dynamic_update_index_in_dim(
                s, s[0] * (1.0 + 1e-9), 0, axis=0)
            v = stream_propagate_staged(program_b, s, empty_house)
            return (acc + v.sum(), s)
        acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                   (jnp.asarray(0.0, dtype), s))
        return acc

    repeat_bdd = exported_cached(f"rep-bdd-{bdd_b.n_nodes}n",
                                 repeat_bdd, staged_b, 2)
    b_iters = int(os.environ.get("BENCH_BDD_ITERS", "1024"))
    # Sub-ms kernel: plausibility-cap in quantifications/s terms only
    # (span check still applies).
    bdd_dt, b_iters = measure(
        lambda n: _best3(repeat_bdd, staged_b, n), b_iters,
        name="bdd-stream")
    _record("bdd-stream", bdd_trials / bdd_dt, "exact quantifications/s",
            bdd_dt, b_iters)
    print(f"bench[bdd-stream {bdd_b.n_nodes}n exact]: "
          f"{bdd_dt*1e3:.3f} ms/iter, "
          f"{bdd_trials/bdd_dt/1e6:.1f}M exact quantifications/s",
          file=sys.stderr)


def sec_bf16(rng, roofline, tree, n_trials, iters, gather_value):
    """bf16-storage gather on the big uniform tree at double the trial
    width (storage halves row bytes; compute stays f32)."""
    import jax
    import jax.numpy as jnp
    from canopy_tpu.engine.propagate import top_event_probability

    bf_trials = 2 * n_trials
    basic_bf = jnp.asarray(
        rng.uniform(0.0, 0.05, (bf_trials, tree.n_basic)), jnp.bfloat16)
    house_bf = jnp.zeros((0,), jnp.bfloat16)

    @jax.jit
    def repeat_bf(p, n_iter):
        def body(i, carry):
            acc, p = carry
            # Perturbation above bf16 granularity (defeats CSE).
            p = p.at[:, :1].mul(jnp.bfloat16(1.01))
            out = top_event_probability(tree, p, house_bf)
            return (acc + out.astype(jnp.float32).sum(), p)
        acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                   (jnp.asarray(0.0, jnp.float32), p))
        return acc

    bf_dt, iters = measure(
        lambda n: _best3(repeat_bf, basic_bf, n), iters,
        name="gather-bf16", work=tree.nnz * bf_trials, roofline=roofline)
    bf_value = tree.nnz * bf_trials / bf_dt
    _record("gather-bf16", bf_value, "nnz*trials/s", bf_dt, iters)
    print(f"bench[gather-bf16 {tree.n_gates}g T={bf_trials}]: "
          f"{bf_dt*1e3:.2f} ms/iter, {bf_value/1e9:.2f} "
          f"Gnnz*trials/s ({bf_value/max(gather_value,1):.2f}x f32)",
          file=sys.stderr)


def sec_mc(rng, roofline, tree, n_trials, iters, best_float):
    """Bit-packed Boolean MC engine (32 trials per uint32 word)."""
    import jax
    import jax.numpy as jnp
    from canopy_tpu.ops.bitpack import propagate_packed

    house = jnp.zeros((0,), jnp.float32)
    mc_words = max(n_trials // 32, 8)
    packed = jnp.asarray(
        rng.integers(0, 2**32, (tree.n_basic, mc_words), dtype=np.uint32))

    @jax.jit
    def repeat_packed(packed_basic, n_iter):
        def body(i, acc):
            p = packed_basic ^ i.astype(jnp.uint32)
            vals = propagate_packed(tree, p, house)
            count = jax.lax.population_count(vals[tree.top_index])
            return acc + count.sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, n_iter, body,
                                 jnp.asarray(0.0, jnp.float32))

    mc_dt, iters = measure(
        lambda n: _best3(repeat_packed, packed, n), iters,
        name="mc-bitpacked", work=tree.nnz * mc_words * 32,
        roofline=roofline, cap=4 * _CAP)  # 32 trials/word: byte cap differs
    mc_value = tree.nnz * mc_words * 32 / mc_dt
    _record("mc-bitpacked", mc_value, "nnz*trials/s", mc_dt, iters)
    print(f"bench[mc-bitpacked]: {mc_dt*1e3:.2f} ms/iter, "
          f"{mc_value/1e9:.2f} Gnnz*trials/s "
          f"({mc_value/max(best_float,1):.1f}x the float path)",
          file=sys.stderr)


def sec_block_gather(rng, dtype, roofline):
    """Block-gather engine (direct vs log mode) vs gather AND vs the
    stream engine on the same locality-reordered tree — the dominance
    measurement: auto-dispatch routes this tree to the stream engine,
    so block-gather's win-vs-gather only matters if it also beats
    stream (VERDICT r3 item 6)."""
    import jax
    import jax.numpy as jnp
    from canopy_tpu.compiler.reorder import locality_reorder
    from canopy_tpu.engine.propagate import top_event_probability
    from canopy_tpu.ops.block_gather import (auto_t_tile,
                                             block_gather_propagate,
                                             compile_block_gather)
    from canopy_tpu.ops.stream_kernel import (compile_stream, stage_basic,
                                              stream_propagate_staged)
    from canopy_tpu.utils.synthetic import synthetic_hierarchical_tree

    house = jnp.zeros((0,), dtype=dtype)
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
            def body(i, carry):
                acc, p = carry
                p = p.at[:, :1].mul(1.0 + 1e-9)
                v = block_gather_propagate(program_bg, p, t_tile=bg_t,
                                           mode=mode)
                return (acc + v.sum(), p)
            acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                       (jnp.asarray(0.0, dtype), p))
            return acc
        return repeat

    @jax.jit
    def repeat_gather_bg(p, n_iter):
        def body(i, carry):
            acc, p = carry
            p = p.at[:, :1].mul(1.0 + 1e-9)
            return (acc + top_event_probability(tree_bg, p, house).sum(),
                    p)
        acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                   (jnp.asarray(0.0, dtype), p))
        return acc

    bg_iters = int(os.environ.get("BENCH_BG_ITERS", "64"))
    results = {}
    for mode in ("direct", "log"):
        fn = make_repeat(mode)
        dt, used = measure(
            lambda n, fn=fn: _best3(fn, basic_bg, n), bg_iters,
            name=f"block-gather-{mode}", work=tree_bg.nnz * bg_trials,
            roofline=roofline)
        results[mode] = dt
        _record(f"block-gather-{mode}", tree_bg.nnz * bg_trials / dt,
                "nnz*trials/s", dt, used)
    g_dt, g_used = measure(
        lambda n: _best3(repeat_gather_bg, basic_bg, n), bg_iters,
        name="gather-on-bg-tree", work=tree_bg.nnz * bg_trials,
        roofline=roofline)
    _record("gather-on-bg-tree", tree_bg.nnz * bg_trials / g_dt,
            "nnz*trials/s", g_dt, g_used)
    # The engine auto-dispatch actually picks here: the plain stream
    # schedule (the tree's live set is tiny once reordered).  The
    # block engine's auto_t_tile (384) is off the stream kernel's
    # 1024-trial grid, so the stream row runs at its own T — the
    # comparison is rate-based (nnz*trials/s).
    s_dt = None
    if True:
        s_trials_bg = 1024
        basic_sbg = jnp.asarray(
            rng.uniform(0.0, 0.05, (s_trials_bg, tree_bg.n_basic)),
            dtype)
        program_s = compile_stream(tree_bg)
        staged_bg = jax.jit(lambda p: stage_basic(program_s, p))(basic_sbg)
        house_bg = np.zeros(0, np.float32)

        @jax.jit
        def repeat_stream_bg(s, n_iter):
            def body(i, carry):
                acc, s = carry
                s = jax.lax.dynamic_update_index_in_dim(
                    s, s[0] * (1.0 + 1e-9), 0, axis=0)
                v = stream_propagate_staged(program_s, s, house_bg)
                return (acc + v.sum(), s)
            acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                       (jnp.asarray(0.0, dtype), s))
            return acc

        s_dt, s_used = measure(
            lambda n: _best3(repeat_stream_bg, staged_bg, n), bg_iters,
            name="stream-on-bg-tree", work=program_s.nnz * s_trials_bg,
            roofline=roofline)
        _record("stream-on-bg-tree", program_s.nnz * s_trials_bg / s_dt,
                "nnz*trials/s", s_dt, s_used)
        print(f"bench[stream-on-bg-tree]: {s_dt*1e3:.3f} ms/iter at "
              f"T={s_trials_bg}, "
              f"{program_s.nnz * s_trials_bg / s_dt / 1e9:.2f} "
              f"Gnnz*trials/s (vs block-log "
              f"{tree_bg.nnz * bg_trials / results['log'] / 1e9:.2f}, "
              f"gather {tree_bg.nnz * bg_trials / g_dt / 1e9:.2f})",
              file=sys.stderr)
    # Exactness of the direct mode on hardware.
    got = np.asarray(block_gather_propagate(program_bg, basic_bg,
                                            t_tile=bg_t, mode="direct"))
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


def sec_bsr(rng, dtype, roofline, n_trials, iters):
    """BSR/MXU log-space engine after locality reordering, on an
    adversarially shuffled hierarchical tree, vs gather."""
    import jax
    import jax.numpy as jnp
    from canopy_tpu.compiler.reorder import locality_reorder, random_shuffle
    from canopy_tpu.engine.propagate import top_event_probability
    from canopy_tpu.ops.bsr_propagate import (bsr_arrays,
                                              bsr_top_probability,
                                              compile_bsr,
                                              estimate_bsr_fill)
    from canopy_tpu.utils.synthetic import synthetic_hierarchical_tree

    house = jnp.zeros((0,), dtype=dtype)
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
        rng.uniform(0.0, 0.05, (bsr_trials, tree_l.n_basic)), dtype=dtype)

    @jax.jit
    def repeat_bsr(basic_p, n_iter, params):
        def body(i, carry):
            acc, p = carry
            p = p.at[:, :1].mul(1.0 + 1e-9)
            return (acc + bsr_top_probability(
                program, p, params=params).sum(), p)
        acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                   (jnp.asarray(0.0, dtype), basic_p))
        return acc

    @jax.jit
    def repeat_gather_l(basic_p, n_iter):
        def body(i, carry):
            acc, p = carry
            p = p.at[:, :1].mul(1.0 + 1e-9)
            return (acc + top_event_probability(tree_l, p, house).sum(),
                    p)
        acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                   (jnp.asarray(0.0, dtype), basic_p))
        return acc

    bsr_dt, bsr_used = measure(
        lambda n: _best3(repeat_bsr, basic_p_bsr, n, bsr_params), iters,
        name="bsr+reorder", work=tree_l.nnz * bsr_trials,
        roofline=roofline)
    gat_dt, gat_used = measure(
        lambda n: _best3(repeat_gather_l, basic_p_bsr, n), iters,
        name="gather-on-reordered", work=tree_l.nnz * bsr_trials,
        roofline=roofline)
    bsr_v = tree_l.nnz * bsr_trials / bsr_dt
    gat_v = tree_l.nnz * bsr_trials / gat_dt
    _record("bsr+reorder", bsr_v, "nnz*trials/s", bsr_dt, bsr_used)
    _record("gather-on-reordered", gat_v, "nnz*trials/s", gat_dt,
            gat_used)
    print(f"bench[bsr+reorder br={branching}]: {bsr_dt*1e3:.2f} ms "
          f"({bsr_v/1e9:.2f} G/s, fill {fill_shuffled:.0f}x -> "
          f"{program.fill_ratio:.0f}x) vs gather {gat_dt*1e3:.2f} ms "
          f"({gat_v/1e9:.2f} G/s) -> {gat_dt/bsr_dt:.2f}x",
          file=sys.stderr)


# ---------------------------------------------------------------------------


def _base_params():
    n_trials = int(os.environ.get("BENCH_TRIALS", "2048"))
    n_gates = int(os.environ.get("BENCH_GATES", "400000"))
    fanin = int(os.environ.get("BENCH_FANIN", "4"))
    iters = int(os.environ.get("BENCH_ITERS", "16"))
    roofline = _hbm_bandwidth_bytes() / (4.0 + 8.0 / fanin)
    return n_trials, n_gates, fanin, iters, roofline


def _big_tree(n_gates, fanin):
    from canopy_tpu.utils.synthetic import synthetic_compiled_tree
    return host_cached(
        f"tree-{n_gates}g-f{fanin}",
        lambda: synthetic_compiled_tree(n_basic=8192, n_gates=n_gates,
                                        fanin=fanin, n_levels=14,
                                        seed=0))


def _runner(name):
    """Build the section's inputs and run it (fresh rng per section, so
    in-process and subprocess modes draw identical inputs)."""
    import jax.numpy as jnp
    n_trials, n_gates, fanin, iters, roofline = _base_params()
    rng = np.random.default_rng(0)
    dtype = jnp.float32
    if name == "fused-tiled":
        sec_fused_tiled(rng, dtype, roofline)
    elif name == "fused-vmem":
        sec_fused_vmem(rng, dtype, roofline, fanin)
    elif name == "gather":
        sec_gather(rng, dtype, roofline, _big_tree(n_gates, fanin),
                   n_trials, iters)
    elif name == "replay":
        sec_replay(rng, dtype, roofline, fanin)
    elif name == "adjoint":
        sec_adjoint(rng, dtype, roofline)
    elif name == "stream":
        sec_stream(rng, dtype, roofline)
    elif name == "spill":
        sec_spill(rng, dtype, roofline, fanin)
    elif name == "config3-1M":
        sec_config3(rng, dtype, roofline, fanin)
    elif name == "bdd-stream":
        sec_bdd_stream(rng, dtype, roofline)
    elif name == "gather-bf16":
        gv = float(os.environ.get("BENCH_GATHER_VALUE", "0") or 0)
        sec_bf16(rng, roofline, _big_tree(n_gates, fanin), n_trials,
                 iters, gv)
    elif name == "mc-bitpacked":
        bv = float(os.environ.get("BENCH_BEST_VALUE", "0") or 0)
        sec_mc(rng, roofline, _big_tree(n_gates, fanin), n_trials,
               iters, bv)
    elif name == "replay-adjoint":
        sec_replay_adjoint(rng, dtype, roofline, fanin)
    elif name == "replay-adjoint-65k":
        # The VERDICT r4 item-3 criterion scale: the sub-kernel-split
        # backward makes the 65k tree compile; the export cache makes
        # it FIT the driver window (the ~17 min one-time trace happens
        # in the rehearsal, the driver run deserializes in seconds).
        # Guard: with a COLD cache the trace would eat the whole
        # window and starve later sections — fail fast instead.
        import jax as _jax
        if _jax.default_backend() == "tpu" and _budget_s() < 3600 \
                and not export_cache_has("rep-radj-65536g"):
            raise RuntimeError(
                "cold export cache: the 65k adjoint's one-time host "
                "trace (~17 min) exceeds the window; a rehearsal run "
                "(BENCH_BUDGET_S >= 3600) warms .jax_cache/exported "
                "first")
        os.environ["BENCH_RADJ_GATES"] = "65536"
        os.environ.setdefault("BENCH_RADJ_ITERS", "16")
        # Default sub-kernel config: the dev r05 sweep measured larger
        # sub-kernels + a smaller adjoint pool at only +1.5% (4.873 vs
        # 4.948 ms/iter) — the boundary dump/load overlaps compute, so
        # the simple config stands.
        sec_replay_adjoint(rng, dtype, roofline, fanin)
    elif name == "replay-config3":
        sec_replay_config3(rng, dtype, roofline, fanin)
    elif name == "auto-400k":
        sec_auto400k(rng, dtype, roofline, fanin)
    elif name == "block-gather":
        sec_block_gather(rng, dtype, roofline)
    elif name == "bsr":
        sec_bsr(rng, dtype, roofline, n_trials, iters)
    else:
        raise ValueError(f"unknown section {name!r}")


SECTION_RUNNERS = {
    name: (lambda n=name: _runner(n))
    for name in ("fused-tiled", "fused-vmem", "gather", "replay",
                 "adjoint", "stream", "spill", "config3-1M",
                 "bdd-stream", "gather-bf16", "mc-bitpacked",
                 "replay-adjoint", "replay-adjoint-65k",
                 "replay-config3", "auto-400k",
                 "block-gather", "bsr")
}


def _child_main(name) -> int:
    try:
        SECTION_RUNNERS[name]()
    except Exception as exc:
        print(f"bench[{name}] skipped: {exc}", file=sys.stderr)
        print("section-result: " + json.dumps(_sections), flush=True)
        return 1
    print("section-result: " + json.dumps(_sections), flush=True)
    return 0


def _emit_state(final: bool = False) -> None:
    """Cumulative machine-readable state: the stdout contract line plus
    the stderr ``bench-sections:``/``bench-failed:`` lines, re-emitted
    after EVERY section so a driver kill at any point leaves a complete
    record of everything that ran (VERDICT r4 item 1c: r3 and r4 both
    lost their end-of-run records to kills)."""
    tiled_value = _sections.get("fused-tiled", {}).get("value", 0.0)
    fused_value = _sections.get("fused-vmem", {}).get("value", 0.0)
    gather_value = _sections.get("gather", {}).get("value", 0.0)
    value = max(gather_value, fused_value, tiled_value)
    roofline = _base_params()[4]
    line = {
        "metric": "spmm_gate_propagation_nnz_trials_per_s",
        "value": value,
        "unit": "nnz*trials/s",
        "vs_baseline": value / roofline,
        "sections": {k: round(v["value"], 3)
                     for k, v in _sections.items()},
    }
    if _failed:
        line["failed"] = _failed
    if value <= 0:
        line["error"] = "all primary sections failed" if final else \
            "no primary section completed yet"
    print(json.dumps(line), flush=True)
    print("bench-sections: " + json.dumps(_sections), file=sys.stderr)
    if _failed:
        print("bench-failed: " + json.dumps(_failed), file=sys.stderr)
    sys.stderr.flush()


def main() -> None:
    import jax

    n_trials, n_gates, fanin, iters, roofline = _base_params()
    print(f"bench: {n_gates} gates (cfg), trials={n_trials}, "
          f"backend={jax.default_backend()}, "
          f"subproc={os.environ.get('BENCH_SUBPROC', '1')}, "
          f"budget={_budget_s():.0f}s, compile cache="
          f"{os.environ.get('JAX_COMPILATION_CACHE_DIR', 'off')}",
          file=sys.stderr)

    # BENCH_ONLY="spill,adjoint" runs just those sections — follow-up
    # passes after a timeout need not recompile the rest.
    _only = os.environ.get("BENCH_ONLY")
    _only = set(_only.split(",")) if _only else None

    # Order: the headline trio (fast compiles — the contract line is
    # never starved), then the criterion sections (replay north star,
    # adjoint criterion, config-3 scale, replay adjoint), then the
    # rest.  Every section is followed by a cumulative re-emission, and
    # run_section clamps each subprocess to the remaining budget.
    plan = [("fused-tiled", "fused-tiled", 600),
            ("fused-vmem", "fused-vmem", 600),
            ("gather", "gather", 900),
            ("replay", "replay", 900),
            ("adjoint", "adjoint", 900),
            ("config3-1M", "config3", 900),
            ("replay-adjoint", "replay-adjoint", 900),
            ("replay-adjoint-65k", "replay-adjoint-65k", 900),
            ("replay-config3", "replay-config3", 900),
            ("stream", "stream", 600),
            ("spill", "spill", 600),
            ("bdd-stream", "bdd", 600),
            ("gather-bf16", "bf16", 600),
            ("mc-bitpacked", "mc", 600),
            ("block-gather", "block-gather", 600),
            ("bsr", "bsr", 600),
            # Last: the public auto-dispatch row re-runs
            # make_propagator's internal schedule build every time
            # (~6 min of pure host work the caches cannot cover) — it
            # must never starve the cheap sections before it.
            ("auto-400k", "auto-400k", 900)]
    for name, alias, cap_s in plan:
        if _only is not None and alias not in _only:
            continue
        run_section(name, timeout_s=cap_s)
        _emit_state()

    _emit_state(final=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--section":
        sys.exit(_child_main(sys.argv[2]))
    main()
