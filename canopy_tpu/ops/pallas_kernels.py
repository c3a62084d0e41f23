"""Pallas TPU kernels for the hot quantification paths.

Two kernels, each attacking the dominant HBM cost of its pipeline:

* :func:`packed_bernoulli` — on-core Bernoulli bit generation. The XLA
  sampler materializes a float uniform per (trial, event) — 4 bytes of
  HBM traffic per trial-bit. This kernel seeds the per-core PRNG
  (`pltpu.prng_seed`), draws raw uint32 bits (`pltpu.prng_random_bits`),
  thresholds against `floor(p * 2^32)` and packs 32 trials per output
  word entirely in VMEM — HBM sees only the packed words: a 128x
  reduction in sampler traffic, feeding ``ops/bitpack.propagate_packed``.
* :func:`fused_propagate` — whole-tree-in-VMEM propagation for
  production-size trees (up to ~30k nodes x 128-trial tile within the
  ~16 MB VMEM budget). The gate structure is *static*, so every argument
  read is static row indexing — no gather hardware needed — and all
  inter-level intermediates live in a VMEM scratch: one HBM read of the
  basic-probability tile and one write of the requested outputs per grid
  step. This is the kernel behind batched uncertainty quantification of
  real (Aralia-class) PRA models.

Both have jnp reference implementations in this package and are verified
bit-exactly in Pallas interpret mode on CPU (``tests/test_pallas.py``);
on TPU they compile with Mosaic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..compiler.graph import CompiledTree

__all__ = ["packed_bernoulli", "fused_propagate", "fused_propagate_tiled",
           "fused_propagate_tiled_staged", "tile_trials",
           "fused_tiled_supported"]


# ---------------------------------------------------------------------------
# Packed Bernoulli sampling.
# ---------------------------------------------------------------------------

def _packed_bernoulli_kernel(seed_ref, threshold_ref, out_ref):
    # Distinct, deterministic stream per grid tile (Mosaic accepts at
    # most two seed values, so the tile coordinates fold into one; kept
    # in int32 — Mosaic scalars cannot be i64 even under jax x64 mode).
    tile = jnp.asarray(
        pl.program_id(0) * pl.num_programs(1) + pl.program_id(1),
        dtype=jnp.int32)
    pltpu.prng_seed(seed_ref[0], tile)
    thr = threshold_ref[:]                       # (B_tile, 1) uint32
    acc = jnp.zeros(out_ref.shape, dtype=jnp.uint32)
    for bit in range(32):
        raw = pltpu.bitcast(pltpu.prng_random_bits(out_ref.shape),
                            jnp.uint32)
        hit = (raw < thr).astype(jnp.uint32)
        acc = acc | (hit << bit)
    out_ref[:] = acc


def packed_bernoulli(seed: int, basic_p: jnp.ndarray, n_trials: int,
                     block_events: int = 256, block_words: int = 128,
                     interpret: bool = False) -> jnp.ndarray:
    """(n_basic, n_trials//32) packed Bernoulli states, sampled on-core.

    ``basic_p``: (n_basic,) probabilities. Trials per event are
    independent; streams are deterministic per (seed, tile). n_trials
    must be a multiple of 32.
    """
    assert n_trials % 32 == 0
    n_basic = basic_p.shape[0]
    n_words = n_trials // 32
    # floor(p * 2^32), clamped so p == 1.0 -> always-hit threshold.
    p64 = jnp.clip(basic_p.astype(jnp.float64), 0.0, 1.0)
    thr = jnp.minimum(jnp.floor(p64 * 4294967296.0), 4294967295.0) \
        .astype(jnp.uint32)[:, None]

    block_events = min(block_events, max(8, n_basic))
    block_words = min(block_words, max(128, n_words)) if n_words >= 128 \
        else n_words
    grid = (pl.cdiv(n_basic, block_events), pl.cdiv(n_words, block_words))

    # Plain interpret mode has no lowering for the TPU PRNG primitives;
    # pltpu.InterpretParams provides TPU-semantics interpretation.
    interpret_mode = pltpu.InterpretParams() if interpret else False
    # Mosaic rejects i64 scalars; the package enables jax x64 globally,
    # so trace the kernel with x64 off (all kernel dtypes are explicit).
    with jax.enable_x64(False):
        return pl.pallas_call(
        _packed_bernoulli_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_events, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_events, block_words),
                               lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_basic, n_words), jnp.uint32),
        interpret=interpret_mode,
        )(jnp.asarray([seed], dtype=jnp.int32), thr)


# ---------------------------------------------------------------------------
# Fused whole-tree propagation.
# ---------------------------------------------------------------------------

def _emit_gate_ops(tree: CompiledTree):
    """Flatten level blocks into a static per-gate op list.

    Returns [(kind, out_slot, args, aux)] where args are (slot, flag)
    pairs; all slots are Python ints (static indexing in-kernel).
    """
    ops = []
    for level in tree.levels:
        for kind, b in level.iter_blocks():
            if kind == "prod":
                for g in range(b.n_gates):
                    args = [(int(b.arg_idx[g, f]), bool(b.arg_flip[g, f]))
                            for f in range(b.arg_idx.shape[1])
                            if b.arg_mask[g, f]]
                    ops.append(("prod", int(b.out_idx[g]), args,
                                bool(b.inv_out[g])))
            elif kind == "pair":
                for g in range(b.n_gates):
                    args = [(int(b.arg_idx[g, f]), bool(b.arg_neg[g, f]))
                            for f in range(2)]
                    ops.append(("pair", int(b.out_idx[g]), args,
                                bool(b.is_iff[g])))
            else:
                for g in range(b.n_gates):
                    args = [(int(b.arg_idx[g, f]), bool(b.arg_neg[g, f]))
                            for f in range(b.arg_idx.shape[1])
                            if b.arg_mask[g, f]]
                    ops.append(("count", int(b.out_idx[g]), args,
                                (int(b.min_num[g]), int(b.max_num[g]))))
    return ops


#: VMEM working budget for the fused kernel (v5e has ~16 MB/core; leave
#: headroom for the pipeline's own buffers).
_FUSED_VMEM_BUDGET = 12 * 1024 * 1024


def fused_supported(tree: CompiledTree,
                    block_trials: int = 128) -> bool:
    """True when the whole tree fits the fused kernel's VMEM budget."""
    per_trial = (tree.n_gates + tree.n_basic) * 4
    return per_trial * block_trials <= _FUSED_VMEM_BUDGET


def fused_propagate(tree: CompiledTree, basic_p: jnp.ndarray,
                    house_states: jnp.ndarray,
                    block_trials: int = 128,
                    interpret: bool = False) -> jnp.ndarray:
    """Top-event probabilities with the whole tree resident in VMEM.

    ``basic_p``: (n_trials, n_basic); returns (n_trials,). Gate structure
    is unrolled at trace time (static row indexing), so this kernel suits
    up to ~tens of thousands of argument edges; check
    :func:`fused_supported` first for larger trees.
    """
    if not fused_supported(tree, block_trials):
        raise ValueError(
            f"tree ({tree.n_gates} gates + {tree.n_basic} basics) x "
            f"{block_trials} trials exceeds the fused kernel's VMEM "
            "budget; use the gather engine")
    n_trials, n_basic = basic_p.shape
    ops = _emit_gate_ops(tree)
    house = np.asarray(house_states, dtype=np.float32)

    def kernel(p_ref, out_ref, scratch):
        # Layout: trials in lanes. p_ref is (n_basic, block_trials), so
        # every read is a contiguous row; scratch holds gate rows.
        n_b = tree.n_basic

        def read(slot):
            if slot < n_b:
                return p_ref[slot, :]
            if slot < n_b + tree.n_house:
                return jnp.full((block_trials,), house[slot - n_b],
                                dtype=jnp.float32)
            return scratch[slot - n_b - tree.n_house, :]

        for kind, out_slot, args, aux in ops:
            if kind == "prod":
                acc = None
                for slot, flip in args:
                    v = read(slot)
                    x = 1.0 - v if flip else v
                    acc = x if acc is None else acc * x
                value = 1.0 - acc if aux else acc
            elif kind == "pair":
                (s0, n0), (s1, n1) = args
                a = read(s0)
                b = read(s1)
                if n0:
                    a = 1.0 - a
                if n1:
                    b = 1.0 - b
                x = a + b - 2.0 * a * b
                value = 1.0 - x if aux else x
            else:  # count: Poisson-binomial DP, statically unrolled.
                lo, hi = aux
                cap = hi + 1
                dp = [jnp.ones((block_trials,), dtype=jnp.float32)] + \
                     [jnp.zeros((block_trials,), dtype=jnp.float32)
                      for _ in range(cap)]
                for slot, neg in args:
                    v = read(slot)
                    if neg:
                        v = 1.0 - v
                    new = [dp[0] * (1.0 - v)]
                    for k in range(1, cap):
                        new.append(dp[k] * (1.0 - v) + dp[k - 1] * v)
                    new.append(dp[cap] + dp[cap - 1] * v)
                    # Note: absorbing state dp[cap] means ">= cap".
                    dp = new[:cap] + [new[cap]]
                value = sum(dp[k] for k in range(lo, hi + 1))
            scratch[out_slot - n_b - tree.n_house, :] = value

        out_ref[0, :] = scratch[tree.top_index - n_b - tree.n_house, :]

    grid = (pl.cdiv(n_trials, block_trials),)
    with jax.enable_x64(False):
        out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((n_basic, block_trials), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, block_trials), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_trials), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tree.n_gates, block_trials),
                                   jnp.float32)],
            interpret=interpret,
        )(basic_p.astype(jnp.float32).T)
    return out[0]


# ---------------------------------------------------------------------------
# Fused propagation with (8, 128) trial tiles per node.
# ---------------------------------------------------------------------------

_TILE_TRIALS = 1024  # 8 sublanes x 128 lanes per node tile.


def fused_tiled_supported(tree: CompiledTree) -> bool:
    """True when every node can hold a full (8, 128) f32 trial tile in
    the fused kernel's VMEM budget (~3k nodes)."""
    return (tree.n_gates + tree.n_basic) * _TILE_TRIALS * 4 \
        <= _FUSED_VMEM_BUDGET


def _make_tiled_kernel(tree: CompiledTree, ops, house: np.ndarray):
    """The (8, 128)-tile kernel body shared by the tiled entry points."""

    def kernel(p_ref, out_ref, scratch):
        n_b = tree.n_basic

        def read(slot):
            if slot < n_b:
                return p_ref[0, slot]                    # (8, 128)
            if slot < n_b + tree.n_house:
                return jnp.full((8, 128), house[slot - n_b],
                                dtype=jnp.float32)
            return scratch[slot - n_b - tree.n_house]

        for kind, out_slot, args, aux in ops:
            if kind == "prod":
                acc = None
                for slot, flip in args:
                    v = read(slot)
                    x = 1.0 - v if flip else v
                    acc = x if acc is None else acc * x
                value = 1.0 - acc if aux else acc
            elif kind == "pair":
                (s0, n0), (s1, n1) = args
                a = read(s0)
                b = read(s1)
                if n0:
                    a = 1.0 - a
                if n1:
                    b = 1.0 - b
                x = a + b - 2.0 * a * b
                value = 1.0 - x if aux else x
            else:  # count: Poisson-binomial DP, statically unrolled.
                lo, hi = aux
                cap = hi + 1
                dp = [jnp.ones((8, 128), dtype=jnp.float32)] + \
                     [jnp.zeros((8, 128), dtype=jnp.float32)
                      for _ in range(cap)]
                for slot, neg in args:
                    v = read(slot)
                    if neg:
                        v = 1.0 - v
                    new = [dp[0] * (1.0 - v)]
                    for k in range(1, cap):
                        new.append(dp[k] * (1.0 - v) + dp[k - 1] * v)
                    new.append(dp[cap] + dp[cap - 1] * v)
                    dp = new[:cap] + [new[cap]]
                value = sum(dp[k] for k in range(lo, hi + 1))
            scratch[out_slot - n_b - tree.n_house] = value

        out_ref[0] = scratch[tree.top_index - n_b - tree.n_house]

    return kernel


def fused_propagate_tiled(tree: CompiledTree, basic_p: jnp.ndarray,
                          house_states: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """:func:`fused_propagate` with full-VPU node tiles.

    The plain fused kernel computes each gate on a (1, block_trials)
    lane row — one of the VPU's eight sublanes.  Here every node's
    working value is a whole (8, 128) register tile (1024 trials per
    grid step), so each multiply runs the VPU at full width: ~8x the
    arithmetic throughput for trees small enough that every node can
    afford a 4 KB tile (~3k nodes; real Aralia-class PRA models are
    well inside).  Requires ``n_trials % 1024 == 0``; `make_propagator`
    dispatches here when shapes allow.
    """
    if not fused_tiled_supported(tree):
        raise ValueError(
            f"tree ({tree.n_gates} gates + {tree.n_basic} basics) "
            "exceeds the tiled fused kernel's VMEM budget")
    n_trials, n_basic = basic_p.shape
    if n_trials % _TILE_TRIALS:
        raise ValueError("tiled fused kernel needs n_trials % 1024 == 0")
    ops = _emit_gate_ops(tree)
    house = np.asarray(house_states, dtype=np.float32)
    n_tiles = n_trials // _TILE_TRIALS
    kernel = _make_tiled_kernel(tree, ops, house)

    # Host layout: (n_tiles, n_basic, 8, 128) — tile-major so each grid
    # step reads one contiguous block.
    p_tiled = tile_trials(basic_p)
    out = _tiled_call(tree, p_tiled, kernel, n_tiles, n_basic, interpret,
                      pinned=False)
    return out.reshape(n_trials)


def _tiled_call(tree, p_tiled, kernel, n_tiles, n_basic, interpret,
                pinned):
    params = (pltpu.CompilerParams(has_side_effects=True) if pinned
              else None)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((1, n_basic, 8, 128),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, 8, 128),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((tree.n_gates, 8, 128),
                                       jnp.float32)],
            compiler_params=params,
            interpret=interpret,
        )(p_tiled)


def tile_trials(basic_p: jnp.ndarray) -> jnp.ndarray:
    """(n_trials, n_basic) -> the tiled kernel's input layout.

    One full pass over the input matrix; hot loops tile once and call
    :func:`fused_propagate_tiled_staged` (the transform costs ~3x the
    kernel itself at production shapes — measured on v5e)."""
    n_trials, n_basic = basic_p.shape
    n_tiles = n_trials // _TILE_TRIALS
    return basic_p.astype(jnp.float32).T.reshape(
        n_basic, n_tiles, 8, 128).transpose(1, 0, 2, 3)


def fused_propagate_tiled_staged(tree: CompiledTree, p_tiled: jnp.ndarray,
                                 house_states: jnp.ndarray,
                                 interpret: bool = False) -> jnp.ndarray:
    """:func:`fused_propagate_tiled` on a pre-tiled input.

    The pallas_call carries ``has_side_effects`` so benchmark loops that
    reuse one staged input cannot be hoisted out by XLA.
    """
    if not fused_tiled_supported(tree):
        raise ValueError("tree exceeds the tiled fused kernel's budget")
    n_tiles, n_basic, _s, _l = p_tiled.shape
    ops = _emit_gate_ops(tree)
    house = np.asarray(house_states, dtype=np.float32)
    kernel = _make_tiled_kernel(tree, ops, house)
    out = _tiled_call(tree, p_tiled, kernel, n_tiles, n_basic, interpret,
                      pinned=True)
    return out.reshape(n_tiles * _TILE_TRIALS)
