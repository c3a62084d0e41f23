"""Block-gather propagation kernel: slab DMA + one-hot MXU selection.

The big-tree answer to the scalar-core DMA issue-rate wall (~56-70 ns
per row, measured for both XLA's gather loop and the per-row DMA kernel
in ``ops/gather_kernel.py``; see docs/BENCHMARKS.md).  Instead of one
row copy per argument edge, each 128-gate chunk issues ONE contiguous
DMA for the row *range* its arguments live in — tight after the
locality reordering pass (``compiler/reorder.py``) — plus a per-level
*resident set* of hot 128-row slabs (shared events / common-cause
windows) loaded once per level.  Per-edge selection then happens inside
VMEM, where it is free of DMA issue costs:

    y     = S @ L                 (MXU: one-hot-sum selection matmul)
    L     = [log v ; log(1-v)]    (doubled rows make complement edges
                                   an index offset, not a data op)
    out   = inv_out ? 1-exp(y) : exp(y)

with ``S`` the chunk's (128, 2C) 0/1 argument-count matrix built
in-kernel on the VPU from int32 index vectors (never materialized in
HBM — this is what kept the BSR einsum formulation overhead-bound and
its tile arrays hundreds of MB).

HBM traffic per level ~= (R/128-gate-chunk + resident) row reads + one
128-row write per chunk: with tight ranges this approaches "read every
child once, write every gate once" — the streaming optimum for the
access pattern, ~5 bytes/nnz at fan-in 8 against the gather
formulation's issue-rate-capped ~56 ns/row.

Scope: product-family levels, no house events (same envelope as the
fused/DMA kernels; other trees stay on the XLA engine).  Trials are
processed in ``t_tile`` slabs.  Exactness: f32 log/exp round trip
(~1e-6 relative, hard 0/1 exact via clamping) — same class as the BSR
engine.

Compile-time fallback: if any level's chunk span (after resident slabs
are excluded) exceeds ``r_max`` rows, :func:`compile_block_gather`
raises ``LogicError`` — callers catch it and use the gather engine.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..compiler.graph import CompiledTree, merge_prod_level
from ..errors import LogicError

__all__ = ["compile_block_gather", "block_gather_propagate",
           "block_gather_supported", "BlockGatherProgram"]

_CHUNK = 128        # Gates per grid step (one MXU row block).
_SLAB = 128         # Resident slab height (rows).
_NEUTRAL = 8        # Neutral rows appended to the resident buffer (v=1).
_LOG_CLAMP = -1e4   # exp(-1e4) underflows to exactly 0 in f32.


@dataclasses.dataclass
class _LevelPlan:
    out_start: int            # First output row of the level.
    n_gates: int
    n_chunks: int
    fan: int
    r_rows: int               # Local-range rows DMA'd per chunk.
    resident_rows: np.ndarray  # (W,) slab start rows (W may be 0).
    chunk_starts: np.ndarray  # (n_chunks, 1) int32, 8-row aligned.
    sel_idx: np.ndarray       # (n_chunks*128, fan) int32 into [0, 2C).
    inv_out: np.ndarray       # (n_chunks*128, 1) f32 (1.0 = complement).
    #: Direct-space mode: indices into [0, C) + separate flip masks
    #: (selection matmuls copy raw values; complements on the VPU).
    sel_raw: np.ndarray | None = None    # (n_chunks*128, fan) int32
    flip: np.ndarray | None = None       # (n_chunks*128, fan) f32

    @property
    def c_rows(self) -> int:
        return self.r_rows + len(self.resident_rows) * _SLAB + _NEUTRAL


@dataclasses.dataclass
class BlockGatherProgram:
    n_basic: int
    n_rows: int               # Padded value-matrix rows (8-aligned + margin).
    top_index: int
    levels: list[_LevelPlan]
    nnz: int

    def hbm_rows_per_level(self) -> list[int]:
        """Rows DMA'd per level (the traffic model, for roofline checks)."""
        return [lv.n_chunks * lv.r_rows
                + len(lv.resident_rows) * _SLAB + lv.n_chunks * _CHUNK
                for lv in self.levels]


def block_gather_supported(tree: CompiledTree) -> bool:
    return tree.n_house == 0 and tree.top_index is not None and all(
        not level.pairs and not level.counts for level in tree.levels)


_VMEM_BUDGET = 13 * 2 ** 20  # Leave headroom under the ~16 MB/core VMEM.


def _level_vmem_bytes(r_rows: int, w: int, t: int) -> int:
    c = r_rows + w * _SLAB + _NEUTRAL
    rows = r_rows + (w * _SLAB + _NEUTRAL) + 2 * c + _CHUNK
    # Selection matrix + column iota + compare temp + slack, each
    # (128 x 2C) elements.
    fixed = 4 * _CHUNK * 2 * c
    return 4 * (t * rows + fixed)


def auto_t_tile(program: "BlockGatherProgram", cap: int = 512) -> int:
    """Largest 128-multiple trial tile whose worst level fits VMEM."""
    t = cap
    while t >= 128:
        if all(_level_vmem_bytes(lv.r_rows, len(lv.resident_rows), t)
               <= _VMEM_BUDGET for lv in program.levels):
            return t
        t -= 128
    raise LogicError("block-gather: no trial tile fits VMEM "
                     "(level DMA windows too large)")


def compile_block_gather(tree: CompiledTree, w_resident: int = 4,
                         r_max: int = 4096) -> BlockGatherProgram:
    """Host-side schedule: per level, resident slabs + chunk ranges +
    in-VMEM selection indices."""
    if not block_gather_supported(tree):
        raise LogicError("block-gather needs prod-family-only levels, "
                         "no house events, and a top index")
    n_rows = -(-tree.n_nodes // 8) * 8 + _CHUNK  # Write margin.
    plans: list[_LevelPlan] = []
    for level in tree.levels:
        merged = merge_prod_level(level)
        G, F = merged.arg_idx.shape
        n_chunks = -(-G // _CHUNK)
        gp = n_chunks * _CHUNK

        args = merged.arg_idx.astype(np.int64)
        mask = merged.arg_mask

        # Resident slabs by GREEDY SPAN RELIEF: the local-range DMA
        # covers each chunk's dense core for free, so residency should
        # go to whatever slab currently inflates the worst chunk's
        # span (shared events / cross-subsystem couplings).  Repeat:
        # find the chunk with the widest non-resident span, evict the
        # extreme slab (min or max side, whichever shrinks it more)
        # into the resident set.  Plain reference counts or fixed
        # outlier thresholds both misallocate slots (measured).
        slab_of = args // _SLAB
        arg_rows_p = np.full((n_chunks * _CHUNK, F), -1, dtype=np.int64)
        arg_rows_p[:G] = np.where(mask, args, -1)
        by_chunk = [np.sort(r[r >= 0]) for r in
                    arg_rows_p.reshape(n_chunks, _CHUNK * F)]
        resident_set: set[int] = set()

        def chunk_span(rows):
            if not len(rows):
                return 0, rows
            keep = ~np.isin(rows // _SLAB, list(resident_set)) \
                if resident_set else np.ones(len(rows), bool)
            rows = rows[keep]
            if not len(rows):
                return 0, rows
            return int(rows[-1] - rows[0] + 1), rows

        while len(resident_set) < w_resident:
            spans = [chunk_span(r) for r in by_chunk]
            worst = max(range(n_chunks), key=lambda c: spans[c][0])
            span, rows = spans[worst]
            if span <= _SLAB * 2:
                break
            # Evict the *side* of the largest slab gap (fewer slabs
            # wins): a chunk reading {shared window} + {dense core} has
            # its span set by the far side as a whole — single-slab
            # eviction is myopic (removing one of two shared slabs
            # changes nothing, so it never looks profitable).
            slabs = np.unique(rows // _SLAB)
            if len(slabs) < 2:
                break
            gap_at = int(np.argmax(np.diff(slabs)))
            lo_side = slabs[:gap_at + 1]
            hi_side = slabs[gap_at + 1:]
            side = lo_side if len(lo_side) <= len(hi_side) else hi_side
            budget = w_resident - len(resident_set)
            if len(side) > budget:
                break  # Cannot clear the side; more evictions won't help.
            resident_set.update(int(s) for s in side)
        resident = np.sort(np.array(sorted(resident_set), dtype=np.int64))
        res_pos = {int(s): i for i, s in enumerate(resident)}
        is_res = np.isin(slab_of, resident) & mask

        # Per-chunk local ranges over non-resident args.
        local = mask & ~is_res
        chunk_starts = np.zeros((n_chunks, 1), dtype=np.int32)
        r_rows = 8
        arg_pad = np.full((gp, F), -1, dtype=np.int64)
        arg_pad[:G] = np.where(local, args, -1)
        arg_chunks = arg_pad.reshape(n_chunks, _CHUNK * F)
        for c in range(n_chunks):
            rows = arg_chunks[c][arg_chunks[c] >= 0]
            if len(rows):
                start = (int(rows.min()) // 8) * 8
                span = int(rows.max()) - start + 1
                chunk_starts[c, 0] = start
                r_rows = max(r_rows, -(-span // 8) * 8)
        if r_rows > r_max:
            raise LogicError(
                f"block-gather: level chunk span {r_rows} exceeds "
                f"r_max={r_max} (reorder the tree or fall back)")
        # The DMA window is r_rows high for every chunk; clamp starts so
        # windows stay inside the padded matrix (lowering a start only
        # widens coverage downward, never uncovers an argument).
        chunk_starts = np.minimum(chunk_starts, n_rows - r_rows) \
            .astype(np.int32)

        w = len(resident)
        c_rows = r_rows + w * _SLAB + _NEUTRAL
        neutral = r_rows + w * _SLAB  # First neutral row (value 1.0).

        sel = np.full((gp, F), neutral, dtype=np.int32)
        for c in range(n_chunks):
            lo = c * _CHUNK
            hi = min(lo + _CHUNK, G)
            a = args[lo:hi]
            m = mask[lo:hi]
            res = is_res[lo:hi]
            base = np.full(a.shape, neutral, dtype=np.int64)
            # Local args -> offset within the chunk's range.
            base = np.where(m & ~res, a - chunk_starts[c, 0], base)
            # Resident args -> R + slab_pos*128 + row-in-slab.
            if w:
                pos = np.vectorize(lambda s: res_pos.get(int(s), 0))(
                    a // _SLAB)
                base = np.where(res, r_rows + pos * _SLAB + a % _SLAB,
                                base)
            # Complement edges read the log(1-v) half.
            flip = merged.arg_flip[lo:hi] & m
            sel[lo:hi] = (base + np.where(flip, c_rows, 0)).astype(np.int32)

        inv = np.zeros((gp, 1), dtype=np.float32)
        inv[:G, 0] = merged.inv_out.astype(np.float32)
        # Direct-space companion arrays: raw index (no doubling) +
        # flip mask; padded lanes select the neutral row with flip 0.
        sel_raw = np.where(sel >= c_rows, sel - c_rows, sel) \
            .astype(np.int32)
        flip_arr = (sel >= c_rows).astype(np.float32)
        plans.append(_LevelPlan(
            out_start=int(merged.out_idx[0]), n_gates=G,
            n_chunks=n_chunks, fan=F, r_rows=r_rows,
            resident_rows=(resident * _SLAB).astype(np.int32),
            chunk_starts=chunk_starts, sel_idx=sel, inv_out=inv,
            sel_raw=sel_raw, flip=flip_arr))
    return BlockGatherProgram(n_basic=tree.n_basic, n_rows=n_rows,
                              top_index=tree.top_index, levels=plans,
                              nnz=tree.nnz)


def _log_halves(v):
    lv = jnp.maximum(jnp.log(jnp.maximum(v, 1e-300)), _LOG_CLAMP)
    l1 = jnp.maximum(jnp.log(jnp.maximum(1.0 - v, 1e-300)), _LOG_CLAMP)
    return lv, l1


def _level_kernel(res_ref, start_ref, sel_ref, inv_ref, vals_ref,
                  out_vals_ref, local_buf, res_buf, log_buf,
                  out_buf, sems, *, r_rows, w, fan, t, out_start):
    """One level (grid over 128-gate chunks).

    Scratch: ``local_buf`` (R, t) raw local rows; ``res_buf``
    (W*128+8, t) raw resident rows + neutral; ``log_buf`` (2C, t) the
    doubled log matrix (resident section filled once at chunk 0);
    ``out_buf`` (128, t).
    """
    i = pl.program_id(0)
    c_rows = r_rows + w * _SLAB + _NEUTRAL

    @pl.when(i == 0)
    def _():
        # Resident slabs + neutral rows, logged once per level.
        for k in range(w):
            pltpu.make_async_copy(
                vals_ref.at[pl.ds(pl.multiple_of(res_ref[k, 0], _SLAB),
                                  _SLAB)],
                res_buf.at[pl.ds(k * _SLAB, _SLAB)],
                sems.at[1 + k]).start()
        res_buf[pl.ds(w * _SLAB, _NEUTRAL)] = jnp.ones(
            (_NEUTRAL, t), dtype=jnp.float32)
        for k in range(w):
            pltpu.make_async_copy(
                vals_ref.at[pl.ds(pl.multiple_of(res_ref[k, 0], _SLAB),
                                  _SLAB)],
                res_buf.at[pl.ds(k * _SLAB, _SLAB)],
                sems.at[1 + k]).wait()
        lv, l1 = _log_halves(res_buf[:])
        log_buf[pl.ds(r_rows, w * _SLAB + _NEUTRAL)] = lv
        log_buf[pl.ds(c_rows + r_rows, w * _SLAB + _NEUTRAL)] = l1

    # Local range for this chunk.
    start = pl.multiple_of(start_ref[i, 0], 8)
    dma = pltpu.make_async_copy(
        vals_ref.at[pl.ds(start, r_rows)], local_buf, sems.at[0])
    dma.start()
    dma.wait()
    lv, l1 = _log_halves(local_buf[:])
    log_buf[pl.ds(0, r_rows)] = lv
    log_buf[pl.ds(c_rows, r_rows)] = l1

    # Selection matrix: sum of one-hots over fan positions (VPU),
    # then the product in log space on the MXU.
    col = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 2 * c_rows), 1)
    s = jnp.zeros((_CHUNK, 2 * c_rows), dtype=jnp.float32)
    for f in range(fan):
        s = s + (col == sel_ref[:, f:f + 1]).astype(jnp.float32)
    y = jnp.dot(s, log_buf[:], preferred_element_type=jnp.float32)
    prod = jnp.exp(y)
    inv = inv_ref[:]
    out_buf[:] = inv + (1.0 - 2.0 * inv) * prod

    copy_out = pltpu.make_async_copy(
        out_buf, out_vals_ref.at[pl.ds(out_start + i * _CHUNK, _CHUNK)],
        sems.at[0])
    copy_out.start()
    copy_out.wait()


def _level_kernel_direct(res_ref, start_ref, sel_ref, flip_ref, inv_ref,
                         vals_ref, out_vals_ref, val_buf, out_buf, sems,
                         *, r_rows, w, fan, t, out_start):
    """Direct-space variant: per-fan one-hot selection matmuls copy raw
    argument values (f32-exact — a 0/1 selector against f32 rows), then
    complements and the product run on the VPU.  No log/exp at all:
    removes the per-chunk transcendental pass over the whole DMA window
    that keeps the log formulation overhead-bound, at the price of
    ``fan`` narrower matmuls instead of one doubled-width one."""
    i = pl.program_id(0)
    c_rows = r_rows + w * _SLAB + _NEUTRAL

    @pl.when(i == 0)
    def _():
        for k in range(w):
            pltpu.make_async_copy(
                vals_ref.at[pl.ds(pl.multiple_of(res_ref[k, 0], _SLAB),
                                  _SLAB)],
                val_buf.at[pl.ds(r_rows + k * _SLAB, _SLAB)],
                sems.at[1 + k]).start()
        val_buf[pl.ds(r_rows + w * _SLAB, _NEUTRAL)] = jnp.ones(
            (_NEUTRAL, t), dtype=jnp.float32)
        for k in range(w):
            pltpu.make_async_copy(
                vals_ref.at[pl.ds(pl.multiple_of(res_ref[k, 0], _SLAB),
                                  _SLAB)],
                val_buf.at[pl.ds(r_rows + k * _SLAB, _SLAB)],
                sems.at[1 + k]).wait()

    start = pl.multiple_of(start_ref[i, 0], 8)
    dma = pltpu.make_async_copy(
        vals_ref.at[pl.ds(start, r_rows)], val_buf.at[pl.ds(0, r_rows)],
        sems.at[0])
    dma.start()
    dma.wait()

    col = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, c_rows), 1)
    acc = None
    for f in range(fan):
        s = (col == sel_ref[:, f:f + 1]).astype(jnp.float32)
        y = jnp.dot(s, val_buf[:], preferred_element_type=jnp.float32)
        flip = flip_ref[:, f:f + 1]
        x = flip + (1.0 - 2.0 * flip) * y
        acc = x if acc is None else acc * x
    inv = inv_ref[:]
    out_buf[:] = inv + (1.0 - 2.0 * inv) * acc

    copy_out = pltpu.make_async_copy(
        out_buf, out_vals_ref.at[pl.ds(out_start + i * _CHUNK, _CHUNK)],
        sems.at[0])
    copy_out.start()
    copy_out.wait()


def block_gather_propagate(program: BlockGatherProgram,
                           basic_p: jnp.ndarray, t_tile: int | None = None,
                           interpret: bool = False,
                           mode: str = "log") -> jnp.ndarray:
    """(T, n_basic) -> (T,) top probabilities.

    ``T`` must be a multiple of 128 (lane tiling); larger than
    ``t_tile`` (default: the largest VMEM-fitting tile) is processed in
    tiles via ``lax.map``.  ``mode`` (both measured on v5e, 4.7k-gate
    reordered hierarchical tree, fan 8): "log" — the doubled log-row
    formulation, ONE (128, 2C) selection matmul per chunk; 1.66x the
    gather engine on that tree (0.124 vs 0.206 ms/iter), ~1e-6
    relative exactness. "direct" — per-fan one-hot copy matmuls + VPU
    product; BIT-exact vs the gather engine on hardware (the 0/1
    selector copies f32 rows exactly through the MXU) but ``fan``
    matmuls cost 2.2x the fused log matmul at fan 8 — choose it when
    exactness matters more than speed.
    """
    if mode not in ("log", "direct"):
        raise LogicError(f"block-gather: unknown mode {mode!r} "
                         "(expected 'log' or 'direct')")
    T = basic_p.shape[0]
    if T % 128:
        raise LogicError("block-gather needs T % 128 == 0")
    if t_tile is None:
        t_tile = auto_t_tile(program)
    if T > t_tile:
        if T % t_tile:
            raise LogicError("T must divide into t_tile slabs")
        chunks = basic_p.reshape(T // t_tile, t_tile, -1)
        out = jax.lax.map(
            lambda c: block_gather_propagate(program, c, t_tile=t_tile,
                                             interpret=interpret,
                                             mode=mode), chunks)
        return out.reshape(T)

    t = T
    vals = jnp.concatenate([
        basic_p.T.astype(jnp.float32),
        jnp.zeros((program.n_rows - program.n_basic, t), jnp.float32),
    ], axis=0)

    for plan in program.levels:
        w = len(plan.resident_rows)
        c_rows = plan.c_rows
        res_arr = np.zeros((max(w, 1), 1), dtype=np.int32)
        res_arr[:w, 0] = plan.resident_rows
        if mode == "direct":
            kernel = functools.partial(
                _level_kernel_direct, r_rows=plan.r_rows, w=w,
                fan=plan.fan, t=t, out_start=plan.out_start)
            in_specs = [
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((_CHUNK, plan.fan), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_CHUNK, plan.fan), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_CHUNK, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ]
            inputs = (jnp.asarray(res_arr), jnp.asarray(plan.chunk_starts),
                      jnp.asarray(plan.sel_raw), jnp.asarray(plan.flip),
                      jnp.asarray(plan.inv_out), vals)
            scratch = [
                pltpu.VMEM((c_rows, t), jnp.float32),
                pltpu.VMEM((_CHUNK, t), jnp.float32),
                pltpu.SemaphoreType.DMA((1 + max(w, 1),)),
            ]
            alias = {5: 0}
        else:
            kernel = functools.partial(
                _level_kernel, r_rows=plan.r_rows, w=w, fan=plan.fan,
                t=t, out_start=plan.out_start)
            in_specs = [
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((_CHUNK, plan.fan), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_CHUNK, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ]
            inputs = (jnp.asarray(res_arr), jnp.asarray(plan.chunk_starts),
                      jnp.asarray(plan.sel_idx), jnp.asarray(plan.inv_out),
                      vals)
            scratch = [
                pltpu.VMEM((plan.r_rows, t), jnp.float32),
                pltpu.VMEM((w * _SLAB + _NEUTRAL, t), jnp.float32),
                pltpu.VMEM((2 * c_rows, t), jnp.float32),
                pltpu.VMEM((_CHUNK, t), jnp.float32),
                pltpu.SemaphoreType.DMA((1 + max(w, 1),)),
            ]
            alias = {4: 0}
        with jax.enable_x64(False):
            vals = pl.pallas_call(
                kernel,
                grid=(plan.n_chunks,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                out_shape=jax.ShapeDtypeStruct(vals.shape, jnp.float32),
                input_output_aliases=alias,
                scratch_shapes=scratch,
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
                interpret=(pltpu.InterpretParams() if interpret
                           else False),
            )(*inputs)
    return vals[program.top_index].reshape(T)
