"""Adjoint streaming kernels: reverse-mode at the stream engine's rate.

Executes an :class:`~canopy_tpu.compiler.adjoint.AdjointProgram` — the
forward stream program with an HBM argument tape, then the reversed
program propagating adjoints (see ``compiler/adjoint.py`` for the
schedule design and the per-gate adjoint math).  Wired as a
``jax.custom_vjp`` on the staged streaming entry point, so
``jax.value_and_grad`` through the stream engine (and through the
exact-BDD mux-stream) runs as two Pallas kernels instead of the gather
engine's XLA autodiff — importance analysis at kernel speed
(reference capability: ``settings.h:262-278``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..compiler.adjoint import AdjointProgram, build_adjoint_schedule
from ..compiler.schedule import StreamProgram
from ..errors import LogicError
from .stream_kernel import _TILE_TRIALS, _gate_tile, stream_propagate_staged

__all__ = ["compile_adjoint", "tape_propagate_staged",
           "adjoint_backward_staged", "make_differentiable_stream"]


def compile_adjoint(program: StreamProgram, **kwargs) -> AdjointProgram:
    """Build the adjoint schedule for a stream program (raises
    :class:`LogicError` when it cannot fit — callers fall back to the
    gather engine's autodiff)."""
    return build_adjoint_schedule(program, **kwargs)


def _tape_kernel(p_ref, out_ref, tape_ref, stage, pool, slab, csems,
                 fsems, *, aprog: AdjointProgram, house: np.ndarray):
    prog = aprog.base
    i = pl.program_id(0)
    nbp = prog.n_basic_pad
    ct = prog.chunk_tiles
    TR = aprog.tape_rows

    def chunk_copy(c, buf):
        return pltpu.make_async_copy(
            p_ref.at[pl.ds(i * nbp + c * ct, ct)], stage.at[buf],
            csems.at[buf])

    def flush_copy(sb, n, row0):
        return pltpu.make_async_copy(
            slab.at[sb, pl.ds(0, n)],
            tape_ref.at[pl.ds(i * TR + row0, n)], fsems.at[sb])

    def read(loc):
        tag = loc[0]
        if tag == "pool":
            return pool[loc[1]]
        if tag == "stage":
            return stage[loc[1], loc[2]]
        return jnp.full((8, 128), float(house[loc[1]]), dtype=jnp.float32)

    for op in aprog.fwd_ops:
        tag = op[0]
        if tag == "start":
            chunk_copy(op[1], op[2]).start()
        elif tag == "wait":
            chunk_copy(op[1], op[2]).wait()
        elif tag == "spill":
            pool[op[3]] = stage[op[1], op[2]]
        elif tag == "tput":
            slab[op[2], op[3]] = read(op[1])
        elif tag == "tfstart":
            flush_copy(op[1], op[2], op[3]).start()
        elif tag == "tfwait":
            flush_copy(op[1], op[2], op[3]).wait()
        else:
            _tag, kind, out_slot, locs, aux = op
            pool[out_slot] = _gate_tile(read, kind, locs, aux)

    out_ref[0] = pool[prog.top_slot]


def _zeros():
    return jnp.zeros((8, 128), dtype=jnp.float32)


def _bgate_accumulate(vread, accum, a, kind, bargs, aux):
    """Propagate adjoint tile ``a`` of one gate to its args."""
    one = 1.0
    xs = []
    for vloc, _g, neg in bargs:
        v = vread(vloc)
        xs.append(one - v if neg else v)
    F = len(xs)
    if kind == "prod":
        a_eff = -a if aux else a
        if F == 1:
            parts = [a_eff]
        elif F == 2:
            parts = [xs[1] * a_eff, xs[0] * a_eff]
        else:
            total = xs[0]
            for x in xs[1:]:
                total = total * x
            zero = [x == 0.0 for x in xs]
            zcnt = zero[0].astype(jnp.float32)
            for z in zero[1:]:
                zcnt = zcnt + z.astype(jnp.float32)
            nz = jnp.where(zero[0], 1.0, xs[0])
            for x, z in zip(xs[1:], zero[1:]):
                nz = nz * jnp.where(z, 1.0, x)
            parts = []
            for x, z in zip(xs, zero):
                safe = jnp.where(z, 1.0, x)
                p = jnp.where(zcnt == 0.0, total / safe,
                              jnp.where((zcnt == 1.0) & z, nz, 0.0))
                parts.append(p * a_eff)
    elif kind == "pair":
        a_eff = -a if aux else a
        parts = [(one - 2.0 * xs[1]) * a_eff, (one - 2.0 * xs[0]) * a_eff]
    elif kind == "mux":
        p, hi, lo = xs
        parts = [(hi - lo) * a, p * a, (one - p) * a]
    else:  # count: leave-one-out Poisson-binomial DP.
        lo_n, hi_n = aux
        cap = hi_n + 1
        parts = []
        for skip in range(F):
            dp = [jnp.full((8, 128), 1.0, dtype=jnp.float32)]
            for j in range(F):
                if j == skip:
                    continue
                v = xs[j]
                new = [dp[0] * (one - v)]
                for k in range(1, len(dp)):
                    new.append(dp[k] * (one - v) + dp[k - 1] * v)
                if len(dp) <= cap:
                    new.append(dp[-1] * v)
                else:  # Absorbing cap beyond what the mass sums need.
                    new[-1] = new[-1] + dp[-1] * v
                dp = new

            def mass(a0, b0):
                lo_i, hi_i = max(a0, 0), min(b0, len(dp) - 1)
                if lo_i > hi_i:
                    return _zeros()
                acc = dp[lo_i]
                for k in range(lo_i + 1, hi_i + 1):
                    acc = acc + dp[k]
                return acc
            parts.append((mass(lo_n - 1, hi_n - 1) - mass(lo_n, hi_n)) * a)
    for (vloc, gloc, neg), g in zip(bargs, parts):
        if gloc is None:
            continue
        if neg and kind != "mux":
            g = -g
        accum(gloc, g)


def _adjoint_kernel(tape_ref, ct_ref, gout_ref, tring, gstage, adj,
                    tsems, gsems, *, aprog: AdjointProgram,
                    house: np.ndarray):
    prog = aprog.base
    i = pl.program_id(0)
    nbp = prog.n_basic_pad
    ct = prog.chunk_tiles
    TR = aprog.tape_rows
    tct = aprog.tape_chunk_tiles

    def tape_copy(k, buf, n):
        return pltpu.make_async_copy(
            tape_ref.at[pl.ds(i * TR + k * tct, n)],
            tring.at[buf, pl.ds(0, n)], tsems.at[buf])

    def gflush_copy(c, buf):
        return pltpu.make_async_copy(
            gstage.at[buf], gout_ref.at[pl.ds(i * nbp + c * ct, ct)],
            gsems.at[buf])

    def vread(vloc):
        if vloc[0] == "tape":
            return tring[vloc[1], vloc[2]]
        return jnp.full((8, 128), float(house[vloc[1]]), dtype=jnp.float32)

    def accum(gloc, g):
        if gloc[0] == "apool":
            _t, slot, first = gloc
            adj[slot] = g if first else adj[slot] + g
        else:
            _t, buf, off, _first = gloc
            gstage[buf, off] = gstage[buf, off] + g

    zero_chunk = jnp.zeros((ct, 8, 128), dtype=jnp.float32)
    for op in aprog.bwd_ops:
        tag = op[0]
        if tag == "binit":
            adj[prog.top_slot] = ct_ref[0]
        elif tag == "zflush":
            c = op[1]
            gstage[0] = zero_chunk
            gflush_copy(c, 0).start()
            gflush_copy(c, 0).wait()
        elif tag == "tstart":
            tape_copy(op[1], op[2], op[3]).start()
        elif tag == "twait":
            tape_copy(op[1], op[2], op[3]).wait()
        elif tag == "gzero":
            gstage[op[1]] = zero_chunk
        elif tag == "gfstart":
            gflush_copy(op[1], op[2]).start()
        elif tag == "gfwait":
            gflush_copy(op[1], op[2]).wait()
        elif tag == "gspill":
            _t, buf, off, slot = op
            gstage[buf, off] = adj[slot]
        else:  # bgate
            _t, kind, out_slot, bargs, aux = op
            _bgate_accumulate(vread, accum, adj[out_slot], kind, bargs,
                              aux)


def tape_propagate_staged(aprog: AdjointProgram, staged: jnp.ndarray,
                          house_states, interpret: bool = False):
    """Forward pass with the argument tape.

    Returns ``(top (n_trials,), tape (n_tiles*tape_rows, 8, 128))``.
    """
    prog = aprog.base
    nbp = prog.n_basic_pad
    if staged.ndim != 3 or staged.shape[0] % nbp \
            or staged.shape[1:] != (8, 128):
        raise LogicError("staged layout does not match the program")
    n_tiles = staged.shape[0] // nbp
    house = np.asarray(house_states, dtype=np.float32)
    bufs = max(min(prog.n_chunks, prog.n_bufs), 1)
    kernel = functools.partial(_tape_kernel, aprog=aprog, house=house)
    with jax.enable_x64(False):
        out, tape = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles * aprog.tape_rows, 8, 128),
                                     jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((bufs, prog.chunk_tiles, 8, 128), jnp.float32),
                pltpu.VMEM((max(prog.pool_slots, 1), 8, 128), jnp.float32),
                pltpu.VMEM((2, aprog.slab_tiles, 8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((bufs,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=(pltpu.InterpretParams() if interpret else False),
        )(staged)
    return out.reshape(n_tiles * _TILE_TRIALS), tape


def adjoint_backward_staged(aprog: AdjointProgram, tape: jnp.ndarray,
                            ct: jnp.ndarray, house_states,
                            interpret: bool = False) -> jnp.ndarray:
    """Backward pass: cotangent of the top values -> gradient in the
    staged basic layout (``unstage_basic`` maps it back, or let JAX
    transpose ``stage_basic`` automatically under ``grad``)."""
    prog = aprog.base
    nbp = prog.n_basic_pad
    n_tiles = tape.shape[0] // aprog.tape_rows
    house = np.asarray(house_states, dtype=np.float32)
    gbufs = max(min(prog.n_chunks, prog.n_bufs), 1)
    tbufs = max(min(aprog.n_tape_chunks, aprog.n_tbufs), 1)
    ct3 = ct.reshape(n_tiles, 8, 128).astype(jnp.float32)
    kernel = functools.partial(_adjoint_kernel, aprog=aprog, house=house)
    with jax.enable_x64(False):
        gout = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((n_tiles * nbp, 8, 128),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((tbufs, aprog.tape_chunk_tiles, 8, 128),
                           jnp.float32),
                pltpu.VMEM((gbufs, prog.chunk_tiles, 8, 128), jnp.float32),
                pltpu.VMEM((max(prog.pool_slots, 1), 8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((tbufs,)),
                pltpu.SemaphoreType.DMA((gbufs,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=(pltpu.InterpretParams() if interpret else False),
        )(tape, ct3)
    return gout


def make_differentiable_stream(aprog: AdjointProgram, house_states,
                               interpret: bool = False):
    """A ``fn(staged) -> (n_trials,)`` with a kernel-speed custom VJP.

    The primal call runs the plain streaming kernel (no tape cost);
    under ``jax.grad``/``value_and_grad`` the forward tapes its
    arguments and the backward replays them in reverse.  Gradients flow
    through ``stage_basic`` (pure indexing) automatically, so callers
    differentiate straight through ``stage_basic(program, basic_p)``.
    """
    house = np.asarray(house_states, dtype=np.float32)

    @jax.custom_vjp
    def f(staged):
        return stream_propagate_staged(aprog.base, staged, house,
                                       interpret=interpret)

    def f_fwd(staged):
        out, tape = tape_propagate_staged(aprog, staged, house,
                                          interpret=interpret)
        return out, tape

    def f_bwd(tape, ct):
        return (adjoint_backward_staged(aprog, tape, ct, house,
                                        interpret=interpret),)

    f.defvjp(f_fwd, f_bwd)
    return f
