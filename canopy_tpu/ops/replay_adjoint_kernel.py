"""Adjoint kernels for the replay-stream engine.

Executes a :class:`~canopy_tpu.compiler.replay_adjoint.ReplayAdjointProgram`
— the taped replay forward, then per-segment backward kernels chained in
reverse with XLA scatter-adds accumulating the gate-stream cotangents
into the adjoint log between them (see ``compiler/replay_adjoint.py``
for the schedule design).  Wired as a ``jax.custom_vjp`` on the staged
replay entry point: importance analysis through the replay engine runs
as streams, not scattered autodiff — the spill-scale counterpart of
``ops/adjoint_kernel.py`` (reference capability: ``settings.h:262-278``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..compiler.replay_adjoint import ReplayAdjointProgram
from ..errors import LogicError
from .adjoint_kernel import _bgate_accumulate
from .stream_kernel import _TILE_TRIALS, _gate_tile, replay_propagate_staged

__all__ = ["replay_tape_forward", "replay_adjoint_backward",
           "make_differentiable_replay"]


def _tape_fwd_kernel(brs_ref, grs_ref, scr_in, tape_in, scr_out,
                     tape_ref, *rest, aprog: ReplayAdjointProgram,
                     seg_ops, house: np.ndarray, final: bool, glen: int):
    """One forward segment with the argument tape."""
    prog = aprog.base
    if final:
        top_ref, bring, gring, pool, slab, tslab, bsems, gsems, fsems, \
            rsems, dsem, tfsems = rest
    else:
        bring, gring, pool, slab, tslab, bsems, gsems, fsems, rsems, \
            dsem, tfsems = rest
    del scr_in, tape_in
    i = pl.program_id(0)
    BL = prog.brs_len_pad
    CT = prog.brs_chunk
    GT = prog.grs_chunk
    SR = prog.scratch_rows
    P = prog.pool_slots
    TR = aprog.tape_rows
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

    def tf_copy(sb, n, row0):
        return pltpu.make_async_copy(
            tslab.at[sb, pl.ds(0, n)],
            tape_ref.at[pl.ds(i * TR + row0, n)], tfsems.at[sb])

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
        return jnp.full((8, 128), float(house[loc[1]]), dtype=jnp.float32)

    for op in seg_ops:
        tag = op[0]
        if tag == "bstart":
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
        elif tag == "tput":
            tslab[op[2], op[3]] = read(op[1])
        elif tag == "tfstart":
            tf_copy(op[1], op[2], op[3]).start()
        elif tag == "tfwait":
            tf_copy(op[1], op[2], op[3]).wait()
        else:  # ("gate", kind, out_slot, locs, aux)
            _tag, kind, out_slot, locs, aux = op
            pool[out_slot] = _gate_tile(read, kind, locs, aux)

    if final:
        top_ref[0] = pool[prog.top_slot]


def _bwd_kernel(tape_ref, adj_in, gcot_in, icot_in, ct_ref, adj_out,
                gcot_ref, icot_ref, tring, ibuf, adj, aslab, sidebuf,
                gcbuf, icbuf, tsems, isems, gcsems, icsems, adsem, *,
                aprog: ReplayAdjointProgram, seg_ops,
                house: np.ndarray, iclen: int):
    """One backward SUB-kernel (forward segment k is split into
    sub-kernels of at most ``max_bwd_ops`` estimated tile ops; the
    adjoint pool crosses sub-kernel boundaries through the adjoint
    scratch, and the segment's cotangent output array is threaded
    through every sub-kernel with aliasing — each flushes only its own
    whole chunks)."""
    prog = aprog.base
    del adj_in, gcot_in, icot_in
    i = pl.program_id(0)
    P = prog.pool_slots
    AR = aprog.adj_rows
    TR = aprog.tape_rows
    BL = prog.brs_len_pad
    CT = prog.brs_chunk
    GT = prog.grs_chunk
    adjs = adj_out

    def t_copy(row0, n, buf):
        return pltpu.make_async_copy(
            tape_ref.at[pl.ds(i * TR + row0, n)],
            tring.at[buf, pl.ds(0, n)], tsems.at[buf])

    def i_copy(lo, n, buf):
        return pltpu.make_async_copy(
            adjs.at[pl.ds(i * AR + P + lo, n)],
            ibuf.at[buf, pl.ds(0, n)], isems.at[buf])

    def gc_copy(c, buf):
        return pltpu.make_async_copy(
            gcbuf.at[buf], gcot_ref.at[pl.ds(i * BL + c * CT, CT)],
            gcsems.at[buf])

    def ic_copy(c, buf):
        return pltpu.make_async_copy(
            icbuf.at[buf], icot_ref.at[pl.ds(i * iclen + c * GT, GT)],
            icsems.at[buf])

    def adump_copy():
        return pltpu.make_async_copy(adj, adjs.at[pl.ds(i * AR, P)],
                                     adsem)

    def aload_copy():
        return pltpu.make_async_copy(adjs.at[pl.ds(i * AR, P)], adj,
                                     adsem)

    def vread(vloc):
        if vloc[0] == "tape":
            return tring[vloc[1], vloc[2]]
        return jnp.full((8, 128), float(house[vloc[1]]),
                        dtype=jnp.float32)

    def accum(gloc, g):
        tag = gloc[0]
        if tag == "apool":
            _t, slot, first = gloc
            adj[slot] = g if first else adj[slot] + g
        elif tag == "aslab":
            _t, sb, so, first = gloc
            aslab[sb, so] = g if first else aslab[sb, so] + g
        elif tag == "gcot":
            _t, c, off = gloc
            gcbuf[c % aprog.gcot_bufs, off] = g
        else:  # icot
            _t, c, off = gloc
            icbuf[c % aprog.icot_bufs, off] = g

    zero = jnp.zeros((8, 128), dtype=jnp.float32)
    for op in seg_ops:
        tag = op[0]
        if tag == "binit":
            adj[prog.top_slot] = ct_ref[0]
        elif tag == "lstart":
            aload_copy().start()
        elif tag == "lwait":
            aload_copy().wait()
        elif tag == "dstart":
            adump_copy().start()
        elif tag == "dwait":
            adump_copy().wait()
        elif tag == "tstart":
            t_copy(op[1], op[2], op[3]).start()
        elif tag == "twait":
            t_copy(op[1], op[2], op[3]).wait()
        elif tag == "istart":
            i_copy(op[1], op[2], op[3]).start()
        elif tag == "iwait":
            i_copy(op[1], op[2], op[3]).wait()
        elif tag == "gczero":
            gcbuf[op[1]] = jnp.zeros(
                (aprog.base.brs_chunk, 8, 128), dtype=jnp.float32)
        elif tag == "gcstart":
            gc_copy(op[1], op[2]).start()
        elif tag == "gcwait":
            gc_copy(op[1], op[2]).wait()
        elif tag == "iczero":
            icbuf[op[1]] = jnp.zeros(
                (aprog.base.grs_chunk, 8, 128), dtype=jnp.float32)
        elif tag == "icstart":
            ic_copy(op[1], op[2]).start()
        elif tag == "icwait":
            ic_copy(op[1], op[2]).wait()
        elif tag == "rside":
            sidebuf[op[1]] = adj[op[2]]
        elif tag == "bevict":
            _t, slot, inj, slab_loc, sides = op
            v = zero
            if inj is not None:
                v = v + ibuf[inj[0], inj[1]]
            if slab_loc is not None:
                v = v + aslab[slab_loc[0], slab_loc[1]]
            for idx in sides:
                v = v + sidebuf[idx]
            adj[slot] = v
        else:  # ("bgate", kind, out_slot, bargs, aux)
            _t, kind, out_slot, bargs, aux = op
            _bgate_accumulate(vread, accum, adj[out_slot], kind, bargs,
                              aux)


def replay_tape_forward(aprog: ReplayAdjointProgram, brs: jnp.ndarray,
                        house_states, interpret: bool = False):
    """Taped forward: returns ``(top (n_trials,), tape)``."""
    prog = aprog.base
    BL = prog.brs_len_pad
    if brs.ndim != 3 or brs.shape[0] % BL or brs.shape[1:] != (8, 128):
        raise LogicError("staged stream does not match the program")
    n_tiles = brs.shape[0] // BL
    house = np.asarray(house_states, dtype=np.float32)
    SR = prog.scratch_rows
    scratch = jnp.zeros((n_tiles * SR, 8, 128), jnp.float32)
    tape = jnp.zeros((n_tiles * aprog.tape_rows, 8, 128), jnp.float32)
    scratch_shapes = [
        pltpu.VMEM((prog.brs_bufs, prog.brs_chunk, 8, 128), jnp.float32),
        pltpu.VMEM((prog.grs_bufs, prog.grs_chunk, 8, 128), jnp.float32),
        pltpu.VMEM((max(prog.pool_slots, 1), 8, 128), jnp.float32),
        pltpu.VMEM((prog.slab_bufs, prog.slab_tiles, 8, 128),
                   jnp.float32),
        pltpu.VMEM((2, aprog.tape_slab, 8, 128), jnp.float32),
        pltpu.SemaphoreType.DMA((prog.brs_bufs,)),
        pltpu.SemaphoreType.DMA((prog.grs_bufs,)),
        pltpu.SemaphoreType.DMA((prog.n_flush_sems,)),
        pltpu.SemaphoreType.DMA((prog.n_refill_sems,)),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    top = None
    with jax.enable_x64(False):
        for k, seg in enumerate(aprog.fwd_segments):
            final = k == len(aprog.fwd_segments) - 1
            glen = prog.grs_len_pad[k] if k < len(prog.grs_len_pad) else 0
            if k == 0 or glen == 0:
                glen = prog.grs_chunk
                grs = jnp.zeros((glen, 8, 128), jnp.float32)
            else:
                rows = prog.grs_rows[k]
                idx = (np.arange(n_tiles)[:, None] * SR
                       + rows[None, :]).ravel()
                grs = jnp.take(scratch, jnp.asarray(idx), axis=0)
            kernel = functools.partial(
                _tape_fwd_kernel, aprog=aprog, seg_ops=seg, house=house,
                final=final, glen=glen)
            out_shape = [
                jax.ShapeDtypeStruct(scratch.shape, jnp.float32),
                jax.ShapeDtypeStruct(tape.shape, jnp.float32),
            ]
            out_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2
            if final:
                out_shape.append(
                    jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32))
                out_specs.append(
                    pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM))
            res = pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
                out_specs=out_specs,
                out_shape=out_shape,
                scratch_shapes=scratch_shapes,
                input_output_aliases={2: 0, 3: 1},
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
                interpret=(pltpu.InterpretParams() if interpret
                           else False),
            )(brs, grs, scratch, tape)
            scratch, tape = res[0], res[1]
            if final:
                top = res[2]
    return top.reshape(n_tiles * _TILE_TRIALS), tape


def replay_adjoint_backward(aprog: ReplayAdjointProgram,
                            tape: jnp.ndarray, ct: jnp.ndarray,
                            house_states,
                            interpret: bool = False) -> jnp.ndarray:
    """Backward: cotangent of the top values -> gradient in the staged
    basic-stream layout (``replay_grad_basic`` folds it to
    ``(n_trials, n_basic)``, or let JAX transpose ``stage_replay``)."""
    prog = aprog.base
    n_tiles = tape.shape[0] // aprog.tape_rows
    house = np.asarray(house_states, dtype=np.float32)
    P = prog.pool_slots
    AR = aprog.adj_rows
    n_segs = len(aprog.bwd_segments)
    adjscr = jnp.zeros((n_tiles * AR, 8, 128), jnp.float32)
    gcot = jnp.zeros((n_tiles * prog.brs_len_pad, 8, 128), jnp.float32)
    ct3 = ct.reshape(n_tiles, 8, 128).astype(jnp.float32)
    scratch_shapes = [
        pltpu.VMEM((aprog.tape_bufs, aprog.tct, 8, 128), jnp.float32),
        pltpu.VMEM((aprog.inj_bufs, aprog.inj_chunk, 8, 128),
                   jnp.float32),
        pltpu.VMEM((max(P, 1), 8, 128), jnp.float32),
        pltpu.VMEM((prog.slab_bufs, prog.slab_tiles, 8, 128),
                   jnp.float32),
        pltpu.VMEM((max(aprog.side_cap, 1), 8, 128), jnp.float32),
        pltpu.VMEM((aprog.gcot_bufs, prog.brs_chunk, 8, 128),
                   jnp.float32),
        pltpu.VMEM((aprog.icot_bufs, prog.grs_chunk, 8, 128),
                   jnp.float32),
        pltpu.SemaphoreType.DMA((aprog.tape_bufs,)),
        pltpu.SemaphoreType.DMA((aprog.inj_bufs,)),
        pltpu.SemaphoreType.DMA((aprog.gcot_bufs,)),
        pltpu.SemaphoreType.DMA((aprog.icot_bufs,)),
        pltpu.SemaphoreType.DMA(()),
    ]
    with jax.enable_x64(False):
        for k in range(n_segs - 1, -1, -1):
            iclen = max(prog.grs_len_pad[k], prog.grs_chunk)
            icot = jnp.zeros((n_tiles * iclen, 8, 128), jnp.float32)
            for sub_ops in aprog.bwd_segments[k]:
                kernel = functools.partial(
                    _bwd_kernel, aprog=aprog, seg_ops=sub_ops,
                    house=house, iclen=iclen)
                res = pl.pallas_call(
                    kernel,
                    grid=(n_tiles,),
                    in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4 + [
                        pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM)],
                    out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
                    out_shape=[
                        jax.ShapeDtypeStruct(adjscr.shape, jnp.float32),
                        jax.ShapeDtypeStruct(gcot.shape, jnp.float32),
                        jax.ShapeDtypeStruct(icot.shape, jnp.float32),
                    ],
                    scratch_shapes=scratch_shapes,
                    input_output_aliases={1: 0, 2: 1, 3: 2},
                    compiler_params=pltpu.CompilerParams(
                        has_side_effects=True),
                    interpret=(pltpu.InterpretParams() if interpret
                               else False),
                )(tape, adjscr, gcot, icot, ct3)
                adjscr, gcot, icot = res
            n_raw = prog.grs_len[k]
            if n_raw:
                # Scatter this segment's gate-stream cotangents into the
                # adjoint log (rows are already P + e).
                rows = prog.grs_rows[k][:n_raw]
                idx = (np.arange(n_tiles)[:, None] * AR
                       + rows[None, :]).ravel()
                ic_idx = (np.arange(n_tiles)[:, None] * iclen
                          + np.arange(n_raw)[None, :]).ravel()
                adjscr = adjscr.at[jnp.asarray(idx)].add(
                    icot[jnp.asarray(ic_idx)])
    return gcot


def make_differentiable_replay(aprog: ReplayAdjointProgram, house_states,
                               interpret: bool = False):
    """A ``fn(brs) -> (n_trials,)`` with a stream-speed custom VJP.

    The primal call runs the plain replay kernels (no tape cost); under
    ``jax.grad``/``value_and_grad`` the forward tapes its arguments and
    the backward replays them in reverse.  Gradients flow through
    ``stage_replay`` (pure indexing) automatically, so callers
    differentiate straight through ``stage_replay(program, basic_p)``.
    """
    house = np.asarray(house_states, dtype=np.float32)

    @jax.custom_vjp
    def f(brs):
        return replay_propagate_staged(aprog.base, brs, house,
                                       interpret=interpret)

    def f_fwd(brs):
        out, tape = replay_tape_forward(aprog, brs, house,
                                        interpret=interpret)
        return out, tape

    def f_bwd(tape, ct):
        return (replay_adjoint_backward(aprog, tape, ct, house,
                                        interpret=interpret),)

    f.defvjp(f_fwd, f_bwd)
    return f
