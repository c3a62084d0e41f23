"""DMA-pipelined level-gather kernel: the big-tree propagation path.

The XLA gather engine issues one row copy at a time from its gather loop
(~56 ns per row measured on v5e — far under DMA bandwidth for 8 KB rows).
This kernel drives the row traffic explicitly:

* the value matrix lives in HBM (`pl.ANY`) shaped ``(n_nodes, 8,
  T/8)`` — one full (8, T/8) hardware tile per node, so a single-node
  DMA is tiling-aligned (Mosaic rejects 1-row slices of a 2-D layout);
* the matrix is **aliased in place** (`input_output_aliases`) — levels
  update their contiguous row ranges with no whole-matrix copies;
* per grid tile, argument DMAs for the *next* gate are issued while the
  current gate's product accumulates (double buffering);
* gate outputs accumulate in a VMEM tile and leave as one contiguous
  block copy per tile.

One `pallas_call` per level (static row offset per call), chained inside
the jitted propagation. Product family only — counting/pair families
stay on the XLA engine (a vanishing fraction of real trees). Requires
the trials count to be a multiple of 1024 (lane alignment of T/8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..compiler.graph import CompiledTree

__all__ = ["gather_propagate", "gather_supported"]

_TG = 16  # Gates per grid tile.


def _level_kernel(idx_ref, flip_ref, inv_ref, vals_ref, out_vals_ref,
                  row_buf, out_buf, in_sems, out_sem, *, out_start,
                  n_gates, fanin):
    """One level's product-family gates (grid over gate tiles)."""
    tile = pl.program_id(0)
    base = tile * _TG

    def issue(g_local, slot):
        for f in range(fanin):
            row = idx_ref[g_local, f]
            pltpu.make_async_copy(
                vals_ref.at[pl.ds(row, 1)],
                row_buf.at[slot, f],
                in_sems.at[slot, f]).start()

    @pl.when(base < n_gates)
    def _():
        issue(0, 0)

    def body(g_local, _):
        valid = base + g_local < n_gates

        @pl.when((g_local + 1 < _TG) & (base + g_local + 1 < n_gates))
        def _():
            issue(g_local + 1, (g_local + 1) % 2)

        @pl.when(valid)
        def _():
            slot = g_local % 2
            acc = None
            for f in range(fanin):
                pltpu.make_async_copy(
                    vals_ref.at[pl.ds(idx_ref[g_local, f], 1)],
                    row_buf.at[slot, f],
                    in_sems.at[slot, f]).wait()
                v = row_buf[slot, f, 0]          # (8, T/8) tile.
                x = jnp.where(flip_ref[g_local, f] != 0, 1.0 - v, v)
                acc = x if acc is None else acc * x
            out_buf[g_local] = jnp.where(inv_ref[g_local, 0] != 0,
                                         1.0 - acc, acc)
        return 0

    jax.lax.fori_loop(0, _TG, body, 0)

    copy_out = pltpu.make_async_copy(
        out_buf,
        out_vals_ref.at[pl.ds(out_start + base, _TG)],
        out_sem)
    copy_out.start()
    copy_out.wait()


def gather_supported(tree: CompiledTree) -> bool:
    """Product-family-only, house-free trees qualify for the DMA kernel."""
    return tree.n_house == 0 and all(
        not level.pairs and not level.counts for level in tree.levels)


def gather_propagate(tree: CompiledTree, basic_p: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """(T, n_basic) -> (T,) top probabilities via per-level DMA kernels."""
    assert tree.n_house == 0, "house events: use the XLA gather engine"
    n_trials, n_basic = basic_p.shape
    assert n_trials % 1024 == 0, "the DMA kernel needs T % 1024 == 0"
    lanes = n_trials // 8
    pad_rows = _TG  # Write margin for the final partial tile.
    vals = jnp.concatenate([
        basic_p.T.astype(jnp.float32).reshape(n_basic, 8, lanes),
        jnp.zeros((tree.n_gates + pad_rows, 8, lanes), dtype=jnp.float32),
    ], axis=0)

    for level in tree.levels:
        for block in level.prods:
            G, F = block.arg_idx.shape
            n_tiles = -(-G // _TG)
            idx_padded = np.zeros((n_tiles * _TG, F), dtype=np.int32)
            idx_padded[:G] = block.arg_idx
            flip_padded = np.zeros((n_tiles * _TG, F), dtype=np.int32)
            flip_padded[:G] = block.arg_flip
            inv_padded = np.zeros((n_tiles * _TG, 1), dtype=np.int32)
            inv_padded[:G, 0] = block.inv_out
            kernel = functools.partial(
                _level_kernel, out_start=int(block.out_idx[0]),
                n_gates=G, fanin=F)
            with jax.enable_x64(False):
                vals = pl.pallas_call(
                    kernel,
                    grid=(n_tiles,),
                    in_specs=[
                        pl.BlockSpec((_TG, F), lambda i: (i, 0),
                                     memory_space=pltpu.SMEM),
                        pl.BlockSpec((_TG, F), lambda i: (i, 0),
                                     memory_space=pltpu.SMEM),
                        pl.BlockSpec((_TG, 1), lambda i: (i, 0),
                                     memory_space=pltpu.SMEM),
                        pl.BlockSpec(memory_space=pl.ANY),
                    ],
                    out_specs=pl.BlockSpec(memory_space=pl.ANY),
                    out_shape=jax.ShapeDtypeStruct(vals.shape, jnp.float32),
                    input_output_aliases={3: 0},
                    scratch_shapes=[
                        pltpu.VMEM((2, F, 1, 8, lanes), jnp.float32),
                        pltpu.VMEM((_TG, 8, lanes), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, F)),
                        pltpu.SemaphoreType.DMA(()),
                    ],
                    compiler_params=pltpu.CompilerParams(
                        has_side_effects=True),
                    interpret=(pltpu.InterpretParams() if interpret
                               else False),
                )(jnp.asarray(idx_padded), jnp.asarray(flip_padded),
                  jnp.asarray(inv_padded), vals)
    return vals[tree.top_index].reshape(n_trials)
