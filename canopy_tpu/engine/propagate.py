"""Bottom-up probability propagation over the compiled gate graph.

The quantitative core that replaces the reference's absent evaluation
engine: given per-basic-event probabilities (optionally batched over a
trials axis) and house-event states, propagate through the level schedule
to get every gate's probability under the independence assumption.

Memory layout is **node-major**: the working value matrix is
``(n_nodes, n_trials)`` with the trials axis in vector lanes, so each
argument fetch is a *contiguous row* (one or more full cache lines /
VREGs per node) and each level's output is a contiguous row-block
scatter. The batch-leading public API transposes at the boundary; the
trials-leading layout would turn every gather into a strided column read
and costs ~12x on HBM-bound trees (measured on v5e).

Per level (see ``compiler/graph.py``):

* ``prod`` family — one row gather, one fused conditional complement,
  one product-reduce over the padded fan-in axis, one row-block scatter:
  the CSR-SpMV access pattern in the (x, *) semiring, which becomes the
  SpMM pattern when trials are batched.
* ``pair`` family — closed-form xor/iff on two gathered rows.
* ``count`` family — a Poisson-binomial dynamic program (`lax.scan` over
  the fan-in axis carrying a count distribution with an absorbing cap).
  Exact for atleast/cardinality without combinatorial expansion.

Everything is `jit`/`vmap`/`grad`-compatible.

Exactness note: like any bottom-up probability propagation, results are
exact when no basic event feeds two different argument paths of the same
gate subgraph and approximate otherwise; the BDD engine
(``engine/bdd_eval.py``) is the exact path for shared-event models.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..compiler.graph import CompiledTree, CountBlock, LevelBlock, PairBlock, ProdBlock

__all__ = ["propagate_probability", "top_event_probability",
           "propagate_node_major", "make_propagator",
           "make_staged_propagator", "make_param_propagator"]


def _compute_dtype(vals: jnp.ndarray):
    """Gate math runs in >= f32 even when the value matrix is stored
    narrow (bf16 trials halve HBM rows — the big-tree engine's memory
    ceiling); one rounding per level instead of one per multiply."""
    return jnp.promote_types(vals.dtype, jnp.float32)


def _eval_prod(vals: jnp.ndarray, block: ProdBlock):
    """vals: (n_nodes, B). Returns (out_idx, out (G, B)).

    One fan-in column at a time: each step is a (G, B) row gather fused
    into a multiply — never materializing the (G, F, B) tensor, which
    costs ~3x extra HBM traffic on benchmark-scale trees.
    """
    F = block.arg_idx.shape[1]
    cdt = _compute_dtype(vals)
    acc = None
    for f in range(F):
        v = vals[jnp.asarray(block.arg_idx[:, f])].astype(cdt)
        flip = jnp.asarray(block.arg_flip[:, f])[:, None]
        x = jnp.where(flip, 1.0 - v, v)
        if not block.arg_mask[:, f].all():
            mask = jnp.asarray(block.arg_mask[:, f])[:, None]
            x = jnp.where(mask, x, 1.0)                # Neutral pad.
        acc = x if acc is None else acc * x
    out = jnp.where(jnp.asarray(block.inv_out)[:, None], 1.0 - acc, acc)
    return jnp.asarray(block.out_idx), out


def _eval_pair(vals: jnp.ndarray, block: PairBlock):
    v = vals[block.arg_idx].astype(_compute_dtype(vals))  # (G, 2, B)
    neg = jnp.asarray(block.arg_neg)[..., None]
    v = jnp.where(neg, 1.0 - v, v)
    a, b = v[:, 0, :], v[:, 1, :]
    xor = a + b - 2.0 * a * b
    out = jnp.where(jnp.asarray(block.is_iff)[:, None], 1.0 - xor, xor)
    return jnp.asarray(block.out_idx), out


def _eval_count(vals: jnp.ndarray, block: CountBlock):
    """Poisson-binomial DP with absorbing cap (state ``cap`` = ">= cap")."""
    v = vals[block.arg_idx].astype(_compute_dtype(vals))  # (G, F, B)
    neg = jnp.asarray(block.arg_neg)[..., None]
    mask = jnp.asarray(block.arg_mask)[..., None]
    v = jnp.where(neg, 1.0 - v, v)
    v = jnp.where(mask, v, 0.0)                        # Pad: never true.

    cap = block.cap
    G, _F, B = v.shape
    dp0 = jnp.zeros((G, cap + 1, B), dtype=v.dtype)
    dp0 = dp0.at[:, 0, :].set(1.0)

    def step(dp, p_col):
        p = p_col[:, None, :]                          # (G, 1, B)
        shifted = jnp.concatenate(
            [jnp.zeros_like(dp[:, :1, :]), dp[:, :-1, :]], axis=1)
        new = dp * (1.0 - p) + shifted * p
        new = new.at[:, cap, :].add(dp[:, cap, :] * p[:, 0, :])
        return new, None

    v_scan = jnp.moveaxis(v, 1, 0)                     # (F, G, B)
    dp, _ = jax.lax.scan(step, dp0, v_scan)

    counts = jnp.arange(cap + 1)
    in_range = ((counts[None, :] >= jnp.asarray(block.min_num)[:, None]) &
                (counts[None, :] <= jnp.asarray(block.max_num)[:, None]))
    out = jnp.sum(jnp.where(in_range[..., None], dp, 0.0), axis=1)
    return jnp.asarray(block.out_idx), out


def _write_rows(vals: jnp.ndarray, idx, out: jnp.ndarray) -> jnp.ndarray:
    """Row-block write; contiguous slots (the compiler's family-grouped
    layout) use dynamic-update-slice, which XLA aliases in place instead
    of copying the whole value matrix per level."""
    idx_np = np.asarray(idx)
    if len(idx_np) and (np.diff(idx_np) == 1).all():
        return jax.lax.dynamic_update_slice(vals, out.astype(vals.dtype),
                                            (int(idx_np[0]), 0))
    return vals.at[jnp.asarray(idx_np)].set(out.astype(vals.dtype))


_EVALUATORS = {"prod": _eval_prod, "pair": _eval_pair,
               "count": _eval_count}


def _eval_level(vals: jnp.ndarray, level: LevelBlock) -> jnp.ndarray:
    for kind, block in level.iter_blocks():
        if block.n_gates:
            idx, out = _EVALUATORS[kind](vals, block)
            vals = _write_rows(vals, block.out_idx, out)
    return vals


def propagate_node_major(tree: CompiledTree, basic_nm: jnp.ndarray,
                         house_nm: jnp.ndarray) -> jnp.ndarray:
    """Core pass. ``basic_nm``: (n_basic, B); returns (n_nodes, B)."""
    B = basic_nm.shape[-1]
    parts = [basic_nm]
    if tree.n_house:
        parts.append(jnp.broadcast_to(house_nm, (tree.n_house, B))
                     .astype(basic_nm.dtype))
    parts.append(jnp.zeros((tree.n_gates, B), dtype=basic_nm.dtype))
    vals = jnp.concatenate(parts, axis=0)
    for level in tree.levels:
        vals = _eval_level(vals, level)
    return vals


def _to_node_major(tree: CompiledTree, basic_p, house_states):
    batch_shape = jnp.shape(basic_p)[:-1]
    if tree.n_house:
        batch_shape = jnp.broadcast_shapes(
            batch_shape, jnp.shape(house_states)[:-1])
    B = math.prod(batch_shape) if batch_shape else 1
    basic_p = jnp.broadcast_to(basic_p, batch_shape + (tree.n_basic,))
    basic_nm = jnp.reshape(basic_p, (B, tree.n_basic)).T
    house_nm = jnp.reshape(
        jnp.broadcast_to(house_states, batch_shape + (tree.n_house,)),
        (B, tree.n_house)).T if tree.n_house else \
        jnp.zeros((0, B), dtype=basic_nm.dtype)
    return basic_nm, house_nm, batch_shape


def propagate_probability(tree: CompiledTree, basic_p: jnp.ndarray,
                          house_states: jnp.ndarray) -> jnp.ndarray:
    """Batch-leading API: (..., n_basic) -> (..., n_nodes)."""
    basic_nm, house_nm, batch_shape = _to_node_major(tree, basic_p,
                                                     house_states)
    vals = propagate_node_major(tree, basic_nm, house_nm)
    return jnp.reshape(vals.T, batch_shape + (tree.n_nodes,))


def top_event_probability(tree: CompiledTree, basic_p: jnp.ndarray,
                          house_states: jnp.ndarray | None = None) -> jnp.ndarray:
    """The top event's probability (requires ``tree.top_index``)."""
    if house_states is None:
        house_states = jnp.asarray(tree.house_state_vector())
    basic_nm, house_nm, batch_shape = _to_node_major(tree, basic_p,
                                                     house_states)
    vals = propagate_node_major(tree, basic_nm, house_nm)
    return jnp.reshape(vals[tree.top_index], batch_shape)


#: Auto-dispatch thrashing guard: above this refill density the spill
#: engine loses to gather (measured on v5e, 65k-gate uniform tree:
#: refills/op 0.65 ran at 16.7 G/s vs gather's 36 — single-tile refill
#: DMAs sit on the ~32 GB/s small-transfer floor, and deeper semaphore
#: pipelining does not move it; docs/BENCHMARKS.md). Mildly-spilling
#: structured trees keep the streaming win.  The *replay* engine
#: (compiler/replay.py) removes this wall — measured 254.8 G/s on the
#: same tree, 14x gather — so auto-dispatch prefers it; the guard only
#: gates the legacy spill tier when replay compilation is impossible.
_SPILL_MAX_REFILL_DENSITY = 0.15

#: HBM cap for the replay engine's per-read basic stream under auto
#: dispatch (bytes).  The stream duplicates one (8, 128) tile per basic
#: read per trial-tile; beyond this, batch trials or force
#: ``engine="replay"`` explicitly.
_REPLAY_HBM_CAP = 6 * 2**30


def spill_auto_ok(spill_program) -> bool:
    """Whether auto-dispatch should use this spill schedule (callers
    may still force it with ``engine="spill"``)."""
    return (spill_program.n_refills
            <= _SPILL_MAX_REFILL_DENSITY * spill_program.n_ops)


def _build_house(tree: CompiledTree,
                 house_states: np.ndarray | None) -> np.ndarray:
    if house_states is None:
        return tree.house_state_vector()
    return np.asarray(house_states, dtype=np.float64)


def make_propagator(tree: CompiledTree, output: str = "top",
                    engine: str = "auto",
                    house_states: np.ndarray | None = None):
    """A jitted closure ``f(basic_p, house_states) -> prob``.

    ``house_states`` fixes the house-event vector at build time (default:
    the tree's current states). The kernel engines (fused/stream/block)
    bake it into the compiled program; only the gather engine honors a
    per-call override.

    ``output``: "top" for the top-event scalar, "all" for the full value
    vector. ``engine``: "gather" (this module), "fused" (the
    whole-tree-in-VMEM Pallas kernel; TPU only, top output only),
    "stream" (the register-allocated streaming kernel for structured
    trees beyond VMEM; TPU only, top output, T % 1024 == 0),
    "replay" (the replay-stream kernel — coalesced refill streams for
    cones whose live set thrashes the VMEM pool; same constraints as
    "stream"), "spill" (the legacy Belady-scheduled HBM spill tier —
    single-tile refills; kept for fan-ins wider than the replay rings),
    "block" (the slab-DMA block-gather kernel for big locality-ordered
    trees; TPU only, top output, T % 128 == 0), or "auto" — fused when
    the tree fits VMEM on a TPU backend, stream when a streaming
    schedule exists (live set fits the VMEM pool), replay when it does
    not (up to 2M cone edges; spill if replay cannot schedule), else
    gather. The
    block engine is opt-in: measured on v5e it trails the XLA gather
    engine (its one-hot selection matmul is FLOP-redundant;
    docs/BENCHMARKS.md). One compilation serves any number of
    probability vectors (time steps, uncertainty trials, importance
    grads; grads require the gather engine).
    """
    if engine == "auto" and output == "top" \
            and jax.default_backend() == "tpu":
        from ..errors import LogicError
        from ..compiler.graph import prune_to_top_cone
        from ..ops.pallas_kernels import (fused_propagate,
                                          fused_propagate_tiled,
                                          fused_supported,
                                          fused_tiled_supported)
        from ..ops.stream_kernel import (compile_replay_stream,
                                         compile_spill_stream,
                                         compile_stream,
                                         replay_propagate_staged,
                                         spill_propagate_staged,
                                         stage_basic, stage_replay,
                                         stream_propagate_staged)

        tiled_ok = fused_tiled_supported(tree)
        fused_ok = fused_supported(tree)
        program = None
        replay_program = None
        spill_program = None
        if not tiled_ok:
            try:
                program = compile_stream(tree)
            except LogicError:
                # Live set beyond the plain pool: the replay engine
                # (coalesced refill streams, compiler/replay.py —
                # measured 14x gather on the 65k uniform tree), falling
                # back to the legacy spill tier only when replay cannot
                # schedule (e.g. a fan-in wider than the stream rings).
                # Capped in auto mode — each segment is its own Mosaic
                # compile, so giant cones are opt-in.
                if tree.nnz <= 2_000_000:
                    try:
                        replay_program = compile_replay_stream(tree)
                    except LogicError:
                        try:
                            spill_program = compile_spill_stream(tree)
                            if not spill_auto_ok(spill_program):
                                spill_program = None
                        except LogicError:
                            pass
        if not (tiled_ok or fused_ok or program is not None
                or replay_program is not None
                or spill_program is not None):
            engine = "gather"
        else:
            house = _build_house(tree, house_states)
            # Off-grid / oversized batches fall back to the gather
            # engine; top-only queries evaluate the pruned cone
            # (bit-identical, compiler/graph.prune_to_top_cone).  Built
            # lazily: when the kernel engines serve every call, the
            # fallback's cone build is dead code and costs nothing.
            _cone: list = []

            def cone_tree():
                if not _cone:
                    _cone.append(prune_to_top_cone(tree)
                                 if tree.top_index is not None else tree)
                return _cone[0]

            # Staged engines get an identity-keyed single-entry staging
            # cache: repeated calls on the SAME input array pay the
            # input layout transform once and the kernel per call
            # (measured on the 400k tree: staging 42.9 ms vs the replay
            # kernel's 3.2 ms — VERDICT r4 item 4).  Caching is sound
            # because jax arrays are immutable and the cache holds a
            # reference (the id cannot be recycled while cached);
            # tracers bypass the cache, so the dispatcher still works
            # under an outer jit/vmap (staging inlines per trace).
            def cached_staged(program, stage, run):
                stage_j = jax.jit(stage)
                run_j = jax.jit(run)
                cache: dict = {}

                def call(basic_p):
                    if isinstance(basic_p, jax.core.Tracer):
                        return run_j(stage_j(basic_p))
                    key = (id(basic_p), basic_p.shape, basic_p.dtype)
                    if cache.get("key") != key:
                        cache["key"] = key
                        cache["ref"] = basic_p
                        cache["staged"] = stage_j(basic_p)
                    return run_j(cache["staged"])
                return call

            stream_call = replay_call = spill_call = None
            if program is not None:
                stream_call = cached_staged(
                    program, lambda p: stage_basic(program, p),
                    lambda s: stream_propagate_staged(program, s, house))
            if replay_program is not None:
                replay_call = cached_staged(
                    replay_program,
                    lambda p: stage_replay(replay_program, p),
                    lambda s: replay_propagate_staged(replay_program, s,
                                                      house))
            if spill_program is not None:
                spill_call = cached_staged(
                    spill_program,
                    lambda p: stage_basic(spill_program, p),
                    lambda s: spill_propagate_staged(spill_program, s,
                                                     house))
            tiled_j = jax.jit(lambda p: fused_propagate_tiled(
                tree, p, house)) if tiled_ok else None
            fused_j = jax.jit(lambda p: fused_propagate(tree, p, house)) \
                if fused_ok else None
            gather_j = jax.jit(lambda p: top_event_probability(
                cone_tree(), p, jnp.asarray(house)))

            def fn(basic_p, house_states=None):
                if house_states is not None:
                    raise ValueError(
                        "the auto-selected kernel engines bake house "
                        "states at build time; pass them to "
                        "make_propagator(house_states=...)")
                # Static shapes: full-VPU tiles when the trial count
                # sits on the (8, 128) grid — whole tree resident if it
                # fits, streamed through the VMEM pool otherwise — then
                # the lane-row fused kernel, then gather.
                on_grid = basic_p.shape[0] % 1024 == 0
                if tiled_j is not None and on_grid:
                    return tiled_j(basic_p)
                if stream_call is not None and on_grid:
                    return stream_call(basic_p)
                if replay_call is not None and on_grid and \
                        (basic_p.shape[0] // 1024) \
                        * replay_program.brs_len_pad * 4096 \
                        <= _REPLAY_HBM_CAP:
                    return replay_call(basic_p)
                if spill_call is not None and on_grid:
                    return spill_call(basic_p)
                if fused_j is not None:
                    return fused_j(basic_p)
                return gather_j(basic_p)
            return fn
    if engine == "stream":
        from ..ops.stream_kernel import compile_stream, stream_propagate

        if output != "top":
            raise ValueError("the stream engine only produces the top value")
        program = compile_stream(tree)
        house = _build_house(tree, house_states)

        def fn(basic_p, house_states=None):
            if house_states is not None:
                raise ValueError(
                    "the stream engine bakes house states at build time; "
                    "pass them to make_propagator(house_states=...)")
            # Shapes are static under jit; trial counts off the tile
            # grid fall back to the gather engine.
            if basic_p.shape[0] % 1024 == 0:
                return stream_propagate(program, basic_p, house)
            return top_event_probability(tree, basic_p,
                                         jnp.asarray(house))
        return jax.jit(fn)
    if engine == "replay":
        from ..ops.stream_kernel import (compile_replay_stream,
                                         replay_propagate)

        if output != "top":
            raise ValueError("the replay engine only produces the top value")
        program = compile_replay_stream(tree)
        house = _build_house(tree, house_states)

        def fn(basic_p, house_states=None):
            if house_states is not None:
                raise ValueError(
                    "the replay engine bakes house states at build time; "
                    "pass them to make_propagator(house_states=...)")
            if basic_p.shape[0] % 1024 == 0:
                return replay_propagate(program, basic_p, house)
            return top_event_probability(tree, basic_p,
                                         jnp.asarray(house))
        return jax.jit(fn)
    if engine == "spill":
        from ..ops.stream_kernel import (compile_spill_stream,
                                         spill_propagate)

        if output != "top":
            raise ValueError("the spill engine only produces the top value")
        program = compile_spill_stream(tree)
        house = _build_house(tree, house_states)

        def fn(basic_p, house_states=None):
            if house_states is not None:
                raise ValueError(
                    "the spill engine bakes house states at build time; "
                    "pass them to make_propagator(house_states=...)")
            if basic_p.shape[0] % 1024 == 0:
                return spill_propagate(program, basic_p, house)
            return top_event_probability(tree, basic_p,
                                         jnp.asarray(house))
        return jax.jit(fn)
    if engine == "block":
        from ..ops.block_gather import (block_gather_propagate,
                                        compile_block_gather)

        if output != "top":
            raise ValueError("the block engine only produces the top value")
        program = compile_block_gather(tree)

        def fn(basic_p, house_states=None):
            if house_states is not None:
                raise ValueError(
                    "the block engine supports no house events")
            return block_gather_propagate(program, basic_p)
        return jax.jit(fn)
    if engine == "fused":
        if output != "top":
            raise ValueError("the fused engine only produces the top value")
        from ..ops.pallas_kernels import (fused_propagate,
                                          fused_propagate_tiled,
                                          fused_tiled_supported)

        # House states fold into the kernel (static) — rebuild the
        # propagator to change them.
        house = _build_house(tree, house_states)
        tiled_ok = fused_tiled_supported(tree)

        def fn(basic_p):
            # Shapes are static under jit: full-VPU (8, 128) node tiles
            # for 1024-multiple trial batches (measured 5.1x the
            # lane-row kernel on v5e), lane rows otherwise.
            if tiled_ok and basic_p.shape[0] % 1024 == 0:
                return fused_propagate_tiled(tree, basic_p, house)
            return fused_propagate(tree, basic_p, house)
        return jax.jit(fn)
    baked = _build_house(tree, house_states)
    if output == "top":
        # Top-only gather queries skip gates outside the top cone —
        # bit-identical (per-gate argument lists unchanged) and up to
        # ~5x fewer level rows on big models (compiler/graph.py
        # prune_to_top_cone).
        eval_tree = tree
        if tree.top_index is not None:
            from ..compiler.graph import prune_to_top_cone
            eval_tree = prune_to_top_cone(tree)

        def fn(basic_p, house_states=None):
            h = jnp.asarray(baked) if house_states is None else house_states
            return top_event_probability(eval_tree, basic_p, h)
    else:
        def fn(basic_p, house_states=None):
            h = jnp.asarray(baked) if house_states is None else house_states
            return propagate_probability(tree, basic_p, h)
    return jax.jit(fn)


def make_staged_propagator(tree: CompiledTree,
                           house_states: np.ndarray | None = None):
    """An amortizing ``(stage, run)`` pair for hot loops.

    ``staged = stage(basic_p)`` pays the input layout transform once
    (the staging gather costs as much as one gather-engine pass —
    measured 42.9 ms vs the replay kernel's 3.2 ms on the 400k tree);
    ``run(staged)`` then executes the selected kernel per call.  Engine
    choice mirrors ``make_propagator(engine="auto", output="top")``:
    stream when a plain schedule exists, replay when the pool rejects
    the tree, else the identity stage over the gather engine (pruned to
    the top cone), so callers amortize whichever transform the dispatch
    needs.  TPU kernels require ``n_trials % 1024 == 0``.
    """
    from ..errors import LogicError
    from ..ops.stream_kernel import (compile_replay_stream, compile_stream,
                                     replay_propagate_staged, stage_basic,
                                     stage_replay,
                                     stream_propagate_staged)

    house = _build_house(tree, house_states)
    if jax.default_backend() == "tpu" and tree.top_index is not None:
        try:
            program = compile_stream(tree)

            def stage(basic_p):
                return stage_basic(program, basic_p)

            def run(staged):
                return stream_propagate_staged(program, staged, house)
            return jax.jit(stage), jax.jit(run)
        except LogicError:
            pass
        if tree.nnz <= 2_000_000:
            try:
                rprogram = compile_replay_stream(tree)

                def stage(basic_p):
                    return stage_replay(rprogram, basic_p)

                def run(staged):
                    return replay_propagate_staged(rprogram, staged,
                                                   house)
                return jax.jit(stage), jax.jit(run)
            except LogicError:
                pass
    # Gather fallback: no layout transform to amortize.
    from ..compiler.graph import prune_to_top_cone
    cone = prune_to_top_cone(tree) if tree.top_index is not None else tree

    def run_gather(basic_p):
        return top_event_probability(cone, basic_p, jnp.asarray(house))
    return jax.jit(lambda p: p), jax.jit(run_gather)


def make_param_propagator(tree: CompiledTree):
    """The gather engine with index arrays as *arguments*, not
    closed-over constants.

    Million-gate trees carry tens of MB of index arrays; baked into the
    jaxpr as constants they ship inside every remote-compile request
    (HTTP 413 over ~10 MB on tunneled devices) and defeat donation.
    Here the host precomputes only the static structure (family kinds,
    shapes, contiguity, padding masks) and returns ``(fn, params)``:
    ``params`` is a pytree of device arrays passed per call, and
    ``fn(params, basic_p, house_states) -> (..., top)`` is jit-safe
    with ``params`` traced.  Results are bit-identical to
    :func:`top_event_probability` (same ops, same order).
    """
    from ..errors import LogicError
    if tree.top_index is None:
        raise LogicError("make_param_propagator needs an anchored top")
    params: list = []
    spec: list = []    # static mirror: (kind, static-fields...)
    for level in tree.levels:
        for kind, b in level.iter_blocks():
            if not b.n_gates:
                continue
            idx_np = np.asarray(b.out_idx)
            contig = bool(len(idx_np)
                          and (np.diff(idx_np) == 1).all())
            out0 = int(idx_np[0]) if contig else None
            if kind == "prod":
                arrays = dict(arg_idx=jnp.asarray(b.arg_idx),
                              arg_flip=jnp.asarray(b.arg_flip),
                              inv_out=jnp.asarray(b.inv_out))
                full = [bool(b.arg_mask[:, f].all())
                        for f in range(b.arg_idx.shape[1])]
                if not all(full):
                    arrays["arg_mask"] = jnp.asarray(b.arg_mask)
                if not contig:
                    arrays["out_idx"] = jnp.asarray(idx_np)
                spec.append(("prod", full, contig, out0))
            elif kind == "pair":
                arrays = dict(arg_idx=jnp.asarray(b.arg_idx),
                              arg_neg=jnp.asarray(b.arg_neg),
                              is_iff=jnp.asarray(b.is_iff))
                if not contig:
                    arrays["out_idx"] = jnp.asarray(idx_np)
                spec.append(("pair", contig, out0))
            else:
                arrays = dict(arg_idx=jnp.asarray(b.arg_idx),
                              arg_neg=jnp.asarray(b.arg_neg),
                              arg_mask=jnp.asarray(b.arg_mask),
                              min_num=jnp.asarray(b.min_num),
                              max_num=jnp.asarray(b.max_num))
                if not contig:
                    arrays["out_idx"] = jnp.asarray(idx_np)
                spec.append(("count", b.cap, contig, out0))
            params.append(arrays)
    n_basic, n_house, n_gates = tree.n_basic, tree.n_house, tree.n_gates
    top_index = tree.top_index

    def _write(vals, arrays, contig, out0, out):
        if contig:
            return jax.lax.dynamic_update_slice(
                vals, out.astype(vals.dtype), (out0, 0))
        return vals.at[arrays["out_idx"]].set(out.astype(vals.dtype))

    def fn(params, basic_p, house_states):
        """(T, n_basic), (n_house,) -> (T,) top values."""
        B = basic_p.shape[0]
        basic_nm = basic_p.T
        parts = [basic_nm]
        if n_house:
            parts.append(jnp.broadcast_to(house_states[:, None],
                                          (n_house, B))
                         .astype(basic_nm.dtype))
        parts.append(jnp.zeros((n_gates, B), dtype=basic_nm.dtype))
        vals = jnp.concatenate(parts, axis=0)
        for arrays, sp in zip(params, spec):
            kind = sp[0]
            cdt = _compute_dtype(vals)
            if kind == "prod":
                _k, full, contig, out0 = sp
                F = arrays["arg_idx"].shape[1]
                acc = None
                for f in range(F):
                    v = vals[arrays["arg_idx"][:, f]].astype(cdt)
                    x = jnp.where(arrays["arg_flip"][:, f][:, None],
                                  1.0 - v, v)
                    if not full[f]:
                        x = jnp.where(arrays["arg_mask"][:, f][:, None],
                                      x, 1.0)
                    acc = x if acc is None else acc * x
                out = jnp.where(arrays["inv_out"][:, None],
                                1.0 - acc, acc)
            elif kind == "pair":
                _k, contig, out0 = sp
                v = vals[arrays["arg_idx"]].astype(cdt)
                v = jnp.where(arrays["arg_neg"][..., None], 1.0 - v, v)
                a, b_ = v[:, 0, :], v[:, 1, :]
                x = a + b_ - 2.0 * a * b_
                out = jnp.where(arrays["is_iff"][:, None], 1.0 - x, x)
            else:
                _k, cap, contig, out0 = sp
                v = vals[arrays["arg_idx"]].astype(cdt)
                v = jnp.where(arrays["arg_neg"][..., None], 1.0 - v, v)
                v = jnp.where(arrays["arg_mask"][..., None], v, 0.0)
                G, _F, Bx = v.shape
                dp0 = jnp.zeros((G, cap + 1, Bx), dtype=v.dtype)
                dp0 = dp0.at[:, 0, :].set(1.0)

                def step(dp, p_col):
                    p = p_col[:, None, :]
                    shifted = jnp.concatenate(
                        [jnp.zeros_like(dp[:, :1, :]), dp[:, :-1, :]],
                        axis=1)
                    new = dp * (1.0 - p) + shifted * p
                    new = new.at[:, cap, :].add(dp[:, cap, :]
                                                * p[:, 0, :])
                    return new, None

                dp, _ = jax.lax.scan(step, dp0, jnp.moveaxis(v, 1, 0))
                counts = jnp.arange(cap + 1)
                in_range = ((counts[None, :]
                             >= arrays["min_num"][:, None]) &
                            (counts[None, :]
                             <= arrays["max_num"][:, None]))
                out = jnp.sum(jnp.where(in_range[..., None], dp, 0.0),
                              axis=1)
            vals = _write(vals, arrays, contig, out0, out)
        return vals[top_index]

    return fn, params


def mean_basic_probabilities(tree: CompiledTree) -> np.ndarray:
    """Host-side mean probability vector from the MEF expressions."""
    return np.array([event.p() for event in tree.basic_events],
                    dtype=np.float64)
