"""Streaming fused-tiled propagation: full-VPU tiles at any tree size.

Executes a :class:`~canopy_tpu.compiler.schedule.StreamProgram` — gates in
depth-first order over a linear-scan-allocated VMEM pool, basic-event
tiles streamed from HBM through a ring of staging-chunk DMAs (see
``compiler/schedule.py``).  Every value is a whole (8, 128) f32 trial
tile, so each gate op runs the VPU at full width like
``fused_propagate_tiled``, but VMEM holds only the *live set* (pool) plus
a few staging chunks instead of the whole tree: trees of tens of thousands
of nodes stream at the tiled kernel's arithmetic rate while HBM sees the
streaming optimum — each basic tile read once, one output tile written —
overlapped with compute by the chunk prefetch.

Gate math is identical (same ops, same order) to the fused kernels and
the gather engine, so results are bit-exact across all three.

This kernel is the TPU-shaped replacement for the reference's absent
``src/bool/bool`` data-parallel evaluator (SURVEY.md §2.6) at
production-model scale; interpret-mode tests cover it on CPU
(``tests/test_stream_kernel.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..compiler.graph import CompiledTree
from ..compiler.schedule import StreamProgram, build_stream_schedule
from ..errors import LogicError

__all__ = ["stream_propagate", "stream_propagate_staged", "stage_basic",
           "unstage_basic", "stream_supported", "compile_stream",
           "compile_bdd_stream", "stream_bdd_probability",
           "compile_spill_stream", "spill_propagate",
           "spill_propagate_staged", "compile_replay_stream",
           "stage_replay", "replay_propagate", "replay_propagate_staged",
           "replay_grad_basic"]

_TILE_TRIALS = 1024  # 8 sublanes x 128 lanes per node tile.


def compile_stream(tree: CompiledTree, chunk_tiles: int = 256,
                   n_bufs: int = 3) -> StreamProgram:
    """Schedule ``tree`` for streaming (raises ``LogicError`` if it
    cannot fit — callers fall back to the gather engine)."""
    return build_stream_schedule(tree, chunk_tiles=chunk_tiles,
                                 n_bufs=n_bufs)


def compile_bdd_stream(bdd, chunk_tiles: int = 256) -> StreamProgram:
    """Schedule exact ROBDD evaluation for streaming (one fused mux per
    Shannon node); raises ``LogicError`` when it cannot fit."""
    from ..compiler.schedule import build_bdd_stream_schedule
    return build_bdd_stream_schedule(bdd, chunk_tiles=chunk_tiles)


def stream_bdd_probability(program: StreamProgram, values: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """Exact per-trial top probability over a BDD stream program.

    ``values``: (n_trials, >= max(program.stage_cols)+1) — the global
    probability matrix; the program's ``stage_cols`` select the decision
    variables it reads.  n_trials % 1024 == 0.  Exact for shared-event
    models (same math as ``bdd_eval.bdd_probability``) at the streaming
    kernel's rate.  Hot loops: ``stage_basic`` once and call
    :func:`stream_propagate_staged` directly.
    """
    cols = values[:, jnp.asarray(program.stage_cols)] \
        if program.stage_cols is not None else values
    return stream_propagate_staged(program, stage_basic(program, cols),
                                   np.zeros(0, np.float32),
                                   interpret=interpret)


def stream_supported(tree: CompiledTree, chunk_tiles: int = 256) -> bool:
    """True when a streaming schedule exists for ``tree``."""
    try:
        build_stream_schedule(tree, chunk_tiles=chunk_tiles)
    except LogicError:
        return False
    return True


def _gate_tile(read, kind, locs, aux):
    """One gate/mux/fill op over (8, 128) tiles — shared by the stream
    and spill kernels (same ops, same order: bit-exact across engines
    and vs the gather engine)."""
    if kind == "prod":
        acc = None
        for loc, flip in locs:
            v = read(loc)
            x = 1.0 - v if flip else v
            acc = x if acc is None else acc * x
        return 1.0 - acc if aux else acc
    if kind == "pair":
        (l0, n0), (l1, n1) = locs
        a = read(l0)
        b = read(l1)
        if n0:
            a = 1.0 - a
        if n1:
            b = 1.0 - b
        x = a + b - 2.0 * a * b
        return 1.0 - x if aux else x
    if kind == "mux":
        # Shannon node: p * hi + (1 - p) * lo (exact BDD eval).
        (lp, _), (lh, _), (ll, _) = locs
        p = read(lp)
        return p * read(lh) + (1.0 - p) * read(ll)
    if kind == "fill":
        return jnp.full((8, 128), float(aux), dtype=jnp.float32)
    # count: Poisson-binomial DP, statically unrolled.
    lo, hi = aux
    cap = hi + 1
    dp = [jnp.ones((8, 128), dtype=jnp.float32)] + \
         [jnp.zeros((8, 128), dtype=jnp.float32) for _ in range(cap)]
    for loc, neg in locs:
        v = read(loc)
        if neg:
            v = 1.0 - v
        new = [dp[0] * (1.0 - v)]
        for k in range(1, cap):
            new.append(dp[k] * (1.0 - v) + dp[k - 1] * v)
        new.append(dp[cap] + dp[cap - 1] * v)
        dp = new[:cap] + [new[cap]]
    return sum(dp[k] for k in range(lo, hi + 1))


def _stream_kernel(p_ref, out_ref, stage, pool, sems, *,
                   program: StreamProgram, house: np.ndarray):
    i = pl.program_id(0)
    nbp = program.n_basic_pad
    ct = program.chunk_tiles

    def copy(c, buf):
        return pltpu.make_async_copy(
            p_ref.at[pl.ds(i * nbp + c * ct, ct)], stage.at[buf],
            sems.at[buf])

    def read(loc):
        tag = loc[0]
        if tag == "pool":
            return pool[loc[1]]
        if tag == "stage":
            return stage[loc[1], loc[2]]
        return jnp.full((8, 128), float(house[loc[1]]), dtype=jnp.float32)

    for op in program.ops:
        tag = op[0]
        if tag == "start":
            copy(op[1], op[2]).start()
        elif tag == "wait":
            copy(op[1], op[2]).wait()
        elif tag == "spill":
            pool[op[3]] = stage[op[1], op[2]]
        else:  # ("gate", kind, out_slot, locs, aux)
            _tag, kind, out_slot, locs, aux = op
            pool[out_slot] = _gate_tile(read, kind, locs, aux)

    out_ref[0] = pool[program.top_slot]


def stage_basic(program: StreamProgram,
                basic_p: jnp.ndarray) -> jnp.ndarray:
    """(n_trials, n_basic) -> the staged HBM layout the kernel streams.

    Staging order, padded, tile-major — each chunk DMA is one contiguous
    (chunk_tiles, 8, 128) block.  Stage once, then run
    :func:`stream_propagate_staged` any number of times (time steps,
    house configurations): the transform reads the full input matrix, so
    re-staging per call would dominate the kernel itself.
    """
    n_trials, n_basic = basic_p.shape
    if n_basic != program.n_basic:
        raise LogicError("basic_p width does not match the program")
    if n_trials % _TILE_TRIALS:
        raise LogicError("stream kernel needs n_trials % 1024 == 0")
    n_tiles = n_trials // _TILE_TRIALS
    nbp = program.n_basic_pad
    bp = basic_p.astype(jnp.float32)[:, jnp.asarray(program.basic_perm)].T
    bp = jnp.pad(bp, ((0, nbp - n_basic), (0, 0)))
    return bp.reshape(nbp, n_tiles, 8, 128).transpose(1, 0, 2, 3) \
        .reshape(n_tiles * nbp, 8, 128)


def unstage_basic(program: StreamProgram,
                  staged: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`stage_basic`: staged layout -> (n_trials,
    n_basic).  Diagnostic/testing utility (e.g. validating sharded
    plumbing against the gather engine)."""
    nbp = program.n_basic_pad
    n_tiles = staged.shape[0] // nbp
    bp = staged.reshape(n_tiles, nbp, 8, 128).transpose(1, 0, 2, 3) \
        .reshape(nbp, n_tiles * _TILE_TRIALS)
    inv = np.empty(program.n_basic, dtype=np.int64)
    inv[program.basic_perm] = np.arange(program.n_basic)
    return bp[:program.n_basic][jnp.asarray(inv)].T


def stream_propagate(program: StreamProgram, basic_p: jnp.ndarray,
                     house_states: np.ndarray | jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """(n_trials, n_basic) -> (n_trials,) top-event values.

    ``n_trials`` must be a multiple of 1024 (one (8, 128) tile per grid
    step).  ``house_states`` folds in as compile-time constants, like the
    fused kernels.  Convenience wrapper: stages then runs; hot loops
    should :func:`stage_basic` once and call
    :func:`stream_propagate_staged`.
    """
    return stream_propagate_staged(program, stage_basic(program, basic_p),
                                   house_states, interpret=interpret)


def _spill_kernel(p_ref, scr_in, scr_out, *rest, program, seg_ops,
                  house: np.ndarray, final: bool):
    """One segment of a spill program (``compiler/spill.py``).

    ``scr_in``/``scr_out`` alias the same HBM scratch array (threaded
    through the segment chain); all scratch access is via DMA.
    """
    if final:
        top_ref, stage, pool, slab, csems, fsems, rsems, dsem = rest
    else:
        stage, pool, slab, csems, fsems, rsems, dsem = rest
    del scr_in  # Aliased with scr_out; one ref avoids ambiguity.
    i = pl.program_id(0)
    nbp = program.n_basic_pad
    ct = program.chunk_tiles
    SR = program.scratch_rows
    P = program.pool_slots
    scr = scr_out

    def chunk_copy(c, buf):
        return pltpu.make_async_copy(
            p_ref.at[pl.ds(i * nbp + c * ct, ct)], stage.at[buf],
            csems.at[buf])

    def flush_copy(buf, off0, n, row0, sem):
        return pltpu.make_async_copy(
            slab.at[buf, pl.ds(off0, n)],
            scr.at[pl.ds(i * SR + row0, n)], fsems.at[sem])

    def refill_copy(src, row, slot, sem):
        src_ref = p_ref.at[pl.ds(i * nbp + row, 1)] if src == 0 \
            else scr.at[pl.ds(i * SR + row, 1)]
        return pltpu.make_async_copy(src_ref, pool.at[pl.ds(slot, 1)],
                                     rsems.at[sem])

    def dump_copy():
        return pltpu.make_async_copy(pool, scr.at[pl.ds(i * SR, P)], dsem)

    def load_copy():
        return pltpu.make_async_copy(scr.at[pl.ds(i * SR, P)], pool, dsem)

    def read(loc):
        tag = loc[0]
        if tag == "pool":
            return pool[loc[1]]
        if tag == "stage":
            return stage[loc[1], loc[2]]
        return jnp.full((8, 128), float(house[loc[1]]), dtype=jnp.float32)

    for op in seg_ops:
        tag = op[0]
        if tag == "start":
            chunk_copy(op[1], op[2]).start()
        elif tag == "wait":
            chunk_copy(op[1], op[2]).wait()
        elif tag == "spill":
            pool[op[3]] = stage[op[1], op[2]]
        elif tag == "evict":
            slab[op[2], op[3]] = pool[op[1]]
        elif tag == "efstart":
            flush_copy(op[1], op[2], op[3], op[4], op[5]).start()
        elif tag == "efwait":
            flush_copy(op[1], op[2], op[3], op[4], op[5]).wait()
        elif tag == "rstart":
            refill_copy(op[1], op[2], op[3], op[4]).start()
        elif tag == "rwait":
            refill_copy(op[1], op[2], op[3], op[4]).wait()
        elif tag == "dstart":
            dump_copy().start()
        elif tag == "dwait":
            dump_copy().wait()
        elif tag == "lstart":
            load_copy().start()
        elif tag == "lwait":
            load_copy().wait()
        else:  # ("gate", kind, out_slot, locs, aux)
            _tag, kind, out_slot, locs, aux = op
            pool[out_slot] = _gate_tile(read, kind, locs, aux)

    if final:
        top_ref[0] = pool[program.top_slot]


def compile_spill_stream(tree: CompiledTree, **kwargs):
    """Schedule ``tree`` with the HBM spill tier (``compiler/spill.py``)
    — covers cones whose live set exceeds the plain stream pool."""
    from ..compiler.spill import build_spill_schedule
    return build_spill_schedule(tree, **kwargs)


def spill_propagate(program, basic_p: jnp.ndarray,
                    house_states: np.ndarray | jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """Stage then run a spill program (hot loops: ``stage_basic`` once
    and call :func:`spill_propagate_staged`)."""
    return spill_propagate_staged(program, stage_basic(program, basic_p),
                                  house_states, interpret=interpret)


def spill_propagate_staged(program, staged: jnp.ndarray,
                           house_states: np.ndarray | jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """Run a segmented spill program on an already-staged basic matrix.

    Each segment is one ``pallas_call``; the HBM scratch array threads
    through the chain via input/output aliasing, so the only HBM cost
    beyond staging is the scheduled spill traffic itself.
    """
    nbp = program.n_basic_pad
    if staged.ndim != 3 or staged.shape[0] % nbp \
            or staged.shape[1:] != (8, 128):
        raise LogicError("staged layout does not match the program")
    n_tiles = staged.shape[0] // nbp
    house = np.asarray(house_states, dtype=np.float32)
    bufs = max(min(program.n_chunks, program.n_bufs), 1)
    scratch = jnp.zeros((n_tiles * program.scratch_rows, 8, 128),
                        jnp.float32)
    scratch_shapes = [
        pltpu.VMEM((bufs, program.chunk_tiles, 8, 128), jnp.float32),
        pltpu.VMEM((max(program.pool_slots, 1), 8, 128), jnp.float32),
        pltpu.VMEM((2, program.slab_tiles, 8, 128), jnp.float32),
        pltpu.SemaphoreType.DMA((bufs,)),
        pltpu.SemaphoreType.DMA((program.n_flush_sems,)),
        pltpu.SemaphoreType.DMA((program.n_refill_sems,)),
        pltpu.SemaphoreType.DMA(()),
    ]
    top = None
    with jax.enable_x64(False):
        for k, seg in enumerate(program.segments):
            final = k == len(program.segments) - 1
            kernel = functools.partial(
                _spill_kernel, program=program, seg_ops=seg, house=house,
                final=final)
            out_shape = [jax.ShapeDtypeStruct(scratch.shape, jnp.float32)]
            out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
            if final:
                out_shape.append(
                    jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32))
                out_specs.append(
                    pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM))
            res = pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
                out_specs=out_specs,
                out_shape=out_shape,
                scratch_shapes=scratch_shapes,
                input_output_aliases={1: 0},
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
                interpret=(pltpu.InterpretParams() if interpret
                           else False),
            )(staged, scratch)
            scratch = res[0]
            if final:
                top = res[1]
    return top.reshape(n_tiles * _TILE_TRIALS)


def _replay_kernel(brs_ref, grs_ref, scr_in, scr_out, *rest, program,
                   seg_ops, house: np.ndarray, final: bool, glen: int):
    """One segment of a replay program (``compiler/replay.py``).

    Basic reads stream through the ``bring`` ring from the pre-gathered
    basic replay stream; inter-segment gate re-reads stream through the
    ``gring`` ring from this segment's gathered gate stream; short-arc
    re-reads come straight from the eviction ``slab`` ring; only
    residual intra-segment arcs pay single-tile refill DMAs.
    """
    if final:
        top_ref, bring, gring, pool, slab, rbas, bsems, gsems, fsems, \
            rsems, dsem, rlsem = rest
    else:
        bring, gring, pool, slab, rbas, bsems, gsems, fsems, rsems, \
            dsem, rlsem = rest
    del scr_in  # Aliased with scr_out; one ref avoids ambiguity.
    i = pl.program_id(0)
    BL = program.brs_len_pad
    CT = program.brs_chunk
    GT = program.grs_chunk
    SR = program.scratch_rows
    P = program.pool_slots
    scr = scr_out

    def b_copy(c, buf):
        return pltpu.make_async_copy(
            brs_ref.at[pl.ds(i * BL + c * CT, CT)], bring.at[buf],
            bsems.at[buf])

    def g_copy(c, buf):
        return pltpu.make_async_copy(
            grs_ref.at[pl.ds(i * glen + c * GT, GT)], gring.at[buf],
            gsems.at[buf])

    def f_copy(sbuf, off0, n, row0, sem):
        return pltpu.make_async_copy(
            slab.at[sbuf, pl.ds(off0, n)],
            scr.at[pl.ds(i * SR + row0, n)], fsems.at[sem])

    def r_copy(row, slot, sem):
        return pltpu.make_async_copy(
            scr.at[pl.ds(i * SR + row, 1)], pool.at[pl.ds(slot, 1)],
            rsems.at[sem])

    def dump_copy():
        return pltpu.make_async_copy(pool, scr.at[pl.ds(i * SR, P)], dsem)

    def load_copy():
        return pltpu.make_async_copy(scr.at[pl.ds(i * SR, P)], pool, dsem)

    def rl_copy():
        # Resident-basic block: the chunk-aligned staged PREFIX of this
        # trial tile, one sequential DMA per segment.
        return pltpu.make_async_copy(
            brs_ref.at[pl.ds(i * BL, program.res_tiles)], rbas, rlsem)

    def read(loc):
        tag = loc[0]
        if tag == "pool":
            return pool[loc[1]]
        if tag == "brs":
            return bring[loc[1], loc[2]]
        if tag == "grs":
            return gring[loc[1], loc[2]]
        if tag == "slab":
            return slab[loc[1], loc[2]]
        if tag == "rbas":
            return rbas[loc[1]]
        return jnp.full((8, 128), float(house[loc[1]]), dtype=jnp.float32)

    for op in seg_ops:
        tag = op[0]
        if tag == "rlstart":
            rl_copy().start()
        elif tag == "rlwait":
            rl_copy().wait()
        elif tag == "bstart":
            b_copy(op[1], op[2]).start()
        elif tag == "bwait":
            b_copy(op[1], op[2]).wait()
        elif tag == "gstart":
            g_copy(op[1], op[2]).start()
        elif tag == "gwait":
            g_copy(op[1], op[2]).wait()
        elif tag == "evict":
            slab[op[2], op[3]] = pool[op[1]]
        elif tag == "fstart":
            f_copy(op[1], op[2], op[3], op[4], op[5]).start()
        elif tag == "fwait":
            f_copy(op[1], op[2], op[3], op[4], op[5]).wait()
        elif tag == "rstart":
            r_copy(op[1], op[2], op[3]).start()
        elif tag == "rwait":
            r_copy(op[1], op[2], op[3]).wait()
        elif tag == "dstart":
            dump_copy().start()
        elif tag == "dwait":
            dump_copy().wait()
        elif tag == "lstart":
            load_copy().start()
        elif tag == "lwait":
            load_copy().wait()
        else:  # ("gate", kind, out_slot, locs, aux)
            _tag, kind, out_slot, locs, aux = op
            pool[out_slot] = _gate_tile(read, kind, locs, aux)

    if final:
        top_ref[0] = pool[program.top_slot]


def compile_replay_stream(tree: CompiledTree, **kwargs):
    """Schedule ``tree`` as a replay-stream program
    (``compiler/replay.py``) — the coalesced-refill engine for trees
    whose live set thrashes the plain stream pool.

    The hybrid resident-basic tier defaults ON here (1024 tiles):
    measured on the 400k-gate uniform tree it is +11.6% throughput
    (254.5 -> 284.1 Gnnz*trials/s) and -16% staged-stream HBM despite
    the halved gate pool's extra evictions; trees without basics read
    more than once per segment elect nothing and pay nothing.
    """
    from ..compiler.replay import build_replay_schedule
    kwargs.setdefault("resident_tiles", 1024)
    return build_replay_schedule(tree, **kwargs)


def stage_replay(program, basic_p: jnp.ndarray) -> jnp.ndarray:
    """(n_trials, n_basic) -> the basic replay stream the kernel reads.

    One XLA gather lays every basic *read* out in execution order
    (``program.brs_cols``), tiled per trial-tile — the whole staged
    input is this stream, so the kernel's basic traffic is purely
    sequential chunk DMAs.  Stage once per batch; the gather reads the
    input matrix so re-staging per call would dominate the kernel.
    """
    n_trials, n_basic = basic_p.shape
    if n_basic != program.n_basic:
        raise LogicError("basic_p width does not match the program")
    if n_trials % _TILE_TRIALS:
        raise LogicError("replay kernel needs n_trials % 1024 == 0")
    n_tiles = n_trials // _TILE_TRIALS
    cols = jnp.asarray(program.brs_cols)
    bp = basic_p.astype(jnp.float32)[:, cols].T     # (BL, n_trials)
    return bp.reshape(program.brs_len_pad, n_tiles, 8, 128) \
        .transpose(1, 0, 2, 3) \
        .reshape(n_tiles * program.brs_len_pad, 8, 128)


def replay_grad_basic(program, g_brs: jnp.ndarray,
                      n_trials: int) -> jnp.ndarray:
    """Accumulate a basic-stream cotangent back to (n_trials, n_basic).

    The forward duplicates each basic read into its own stream entry,
    so the backward is a segment-sum over entries by basic column —
    one XLA scatter-add, the exact adjoint of :func:`stage_replay`.
    """
    n_tiles = n_trials // _TILE_TRIALS
    BL = program.brs_len_pad
    g = g_brs.reshape(n_tiles, BL, 8, 128).transpose(1, 0, 2, 3) \
        .reshape(BL, n_trials).T                     # (n_trials, BL)
    cols = jnp.asarray(program.brs_cols)
    out = jnp.zeros((n_trials, program.n_basic), jnp.float32)
    return out.at[:, cols].add(g)


def unstage_replay(program, brs: jnp.ndarray,
                   n_trials: int) -> jnp.ndarray:
    """Reconstruct ``(n_trials, n_basic)`` from a staged replay stream.

    The stream duplicates one entry per *read*, so reconstruction takes
    each basic's first occurrence (all occurrences carry identical
    values by construction).  Basics the cone never reads come back as
    zero — they cannot affect the top value (they only feed gates
    outside the scheduled cone).  Used by the data-parallel plumbing's
    jnp reference local (``parallel/quantify.sharded_replay_step``).
    """
    n_tiles = n_trials // _TILE_TRIALS
    BL = program.brs_len_pad
    cols = np.asarray(program.brs_cols)
    uniq, first = np.unique(cols, return_index=True)
    b4 = brs.reshape(n_tiles, BL, 8, 128)
    picked = b4[:, jnp.asarray(first)]               # (n_tiles, U, 8, 128)
    vals = picked.transpose(1, 0, 2, 3).reshape(len(uniq), n_trials).T
    out = jnp.zeros((n_trials, program.n_basic), brs.dtype)
    return out.at[:, jnp.asarray(uniq)].set(vals)


def replay_propagate(program, basic_p: jnp.ndarray,
                     house_states: np.ndarray | jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """Stage then run a replay program (hot loops: ``stage_replay`` once
    and call :func:`replay_propagate_staged`)."""
    return replay_propagate_staged(program, stage_replay(program, basic_p),
                                   house_states, interpret=interpret)


def replay_propagate_staged(program, brs: jnp.ndarray,
                            house_states: np.ndarray | jnp.ndarray,
                            interpret: bool = False) -> jnp.ndarray:
    """Run a segmented replay program on a staged basic stream.

    Each segment is one ``pallas_call``; the HBM scratch (eviction log)
    threads through the chain via input/output aliasing, and an XLA
    gather between segments materializes the next segment's gate replay
    stream from the log in read order — the coalescing step that
    replaces the spill tier's scattered single-tile refills.
    """
    BL = program.brs_len_pad
    if brs.ndim != 3 or brs.shape[0] % BL or brs.shape[1:] != (8, 128):
        raise LogicError("staged stream does not match the program")
    n_tiles = brs.shape[0] // BL
    house = np.asarray(house_states, dtype=np.float32)
    SR = program.scratch_rows
    scratch = jnp.zeros((n_tiles * SR, 8, 128), jnp.float32)
    scratch_shapes = [
        pltpu.VMEM((program.brs_bufs, program.brs_chunk, 8, 128),
                   jnp.float32),
        pltpu.VMEM((program.grs_bufs, program.grs_chunk, 8, 128),
                   jnp.float32),
        pltpu.VMEM((max(program.pool_slots, 1), 8, 128), jnp.float32),
        pltpu.VMEM((program.slab_bufs, program.slab_tiles, 8, 128),
                   jnp.float32),
        pltpu.VMEM((max(program.res_tiles, 1), 8, 128), jnp.float32),
        pltpu.SemaphoreType.DMA((program.brs_bufs,)),
        pltpu.SemaphoreType.DMA((program.grs_bufs,)),
        pltpu.SemaphoreType.DMA((program.n_flush_sems,)),
        pltpu.SemaphoreType.DMA((program.n_refill_sems,)),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
    ]
    top = None
    with jax.enable_x64(False):
        for k, seg in enumerate(program.segments):
            final = k == len(program.segments) - 1
            glen = program.grs_len_pad[k] if k < len(program.grs_len_pad) \
                else 0
            if k == 0 or glen == 0:
                glen = program.grs_chunk
                grs = jnp.zeros((glen, 8, 128), jnp.float32)
            else:
                rows = program.grs_rows[k]
                idx = (np.arange(n_tiles)[:, None] * SR
                       + rows[None, :]).ravel()
                grs = jnp.take(scratch, jnp.asarray(idx), axis=0)
            kernel = functools.partial(
                _replay_kernel, program=program, seg_ops=seg, house=house,
                final=final, glen=glen)
            out_shape = [jax.ShapeDtypeStruct(scratch.shape, jnp.float32)]
            out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
            if final:
                out_shape.append(
                    jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32))
                out_specs.append(
                    pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM))
            res = pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
                out_specs=out_specs,
                out_shape=out_shape,
                scratch_shapes=scratch_shapes,
                input_output_aliases={2: 0},
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
                interpret=(pltpu.InterpretParams() if interpret
                           else False),
            )(brs, grs, scratch)
            scratch = res[0]
            if final:
                top = res[1]
    return top.reshape(n_tiles * _TILE_TRIALS)


def stream_propagate_staged(program: StreamProgram, staged: jnp.ndarray,
                            house_states: np.ndarray | jnp.ndarray,
                            interpret: bool = False) -> jnp.ndarray:
    """Run the streaming kernel on an already-staged basic matrix."""
    nbp = program.n_basic_pad
    if staged.ndim != 3 or staged.shape[0] % nbp \
            or staged.shape[1:] != (8, 128):
        raise LogicError("staged layout does not match the program")
    n_tiles = staged.shape[0] // nbp
    n_trials = n_tiles * _TILE_TRIALS
    house = np.asarray(house_states, dtype=np.float32)
    bp = staged

    bufs = max(min(program.n_chunks, program.n_bufs), 1)
    kernel = functools.partial(_stream_kernel, program=program,
                               house=house)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((bufs, program.chunk_tiles, 8, 128),
                           jnp.float32),
                pltpu.VMEM((max(program.pool_slots, 1), 8, 128),
                           jnp.float32),
                pltpu.SemaphoreType.DMA((bufs,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=(pltpu.InterpretParams() if interpret else False),
        )(bp)
    return out.reshape(n_trials)
