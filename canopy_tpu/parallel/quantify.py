"""Sharded quantification steps over a ("data", "model") mesh.

Two complementary idioms, both TPU-native (SURVEY.md §2.6, §5):

* **GSPMD annotation** (:func:`sharded_uncertainty_step`): the trials axis
  is laid out over ``data`` with `NamedSharding`; the per-level gate
  computation is replicated in structure but batched over the sharded
  trials axis, so XLA partitions the whole propagation without any
  hand-written collectives — the "annotate shardings, let the compiler
  insert collectives" recipe.
* **Explicit shard_map** (:func:`sharded_cutset_quantifier`): cut-set
  matrix rows are partitioned over ``model`` (each device owns a block of
  products = a CSR row block); per-device partial reductions (rare-event
  sums / MCUB log-sums) meet in a `psum` over ``model`` — the
  tensor-parallel partial-sum pattern, with the trials axis still sharded
  over ``data``. Padding rows are probability-0 products, which are exact
  identities for both reductions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..compiler.graph import CompiledTree
from ..engine.cutset_quantify import CutSetMatrix
from ..engine.propagate import propagate_probability
from ..errors import LogicError

__all__ = ["sharded_stream_grad_step",
           "sharded_uncertainty_step", "sharded_cutset_quantifier",
           "sharded_stream_step", "sharded_replay_step"]


def sharded_uncertainty_step(tree: CompiledTree, mesh: Mesh):
    """jitted (basic_p_batch, house) -> per-trial top probabilities,
    with the trials axis sharded over the mesh's "data" axis."""

    batch_spec = NamedSharding(mesh, P(("data", "model"), None))
    out_spec = NamedSharding(mesh, P(("data", "model")))

    @functools.partial(jax.jit, in_shardings=(batch_spec, None),
                       out_shardings=out_spec)
    def step(basic_p, house):
        vals = propagate_probability(tree, basic_p, house)
        return vals[..., tree.top_index]

    return step


def _pad_rows(array: np.ndarray, multiple: int, fill=0):
    rows = array.shape[0]
    padded = -(-rows // multiple) * multiple
    if padded == rows:
        return array
    pad_width = [(0, padded - rows)] + [(0, 0)] * (array.ndim - 1)
    return np.pad(array, pad_width, constant_values=fill)


def sharded_cutset_quantifier(matrix: CutSetMatrix, mesh: Mesh):
    """jitted (basic_p_batch) -> (rare_event, mcub) per trial.

    Rows (products) are sharded over "model"; trials over "data". Each
    device computes partial sums over its row block; `psum` over "model"
    completes the reduction. Row padding uses an always-false product
    (positive literal of slot 0 with mask off -> probability 1 * 0 mask
    trick is avoided by padding with an explicit zero row: a masked-off
    row yields product probability 1, so a dedicated "dead" flag kills
    padded rows).
    """
    n_model = mesh.shape["model"]
    idx = _pad_rows(matrix.idx, n_model)
    neg = _pad_rows(matrix.neg, n_model)
    mask = _pad_rows(matrix.mask, n_model)
    alive = np.zeros(idx.shape[0], dtype=bool)
    alive[:matrix.n_products] = True

    idx_j = jnp.asarray(idx)
    neg_j = jnp.asarray(neg)
    mask_j = jnp.asarray(mask)
    alive_j = jnp.asarray(alive)

    def local_partial(p_local, idx_l, neg_l, mask_l, alive_l):
        # p_local: (t_local, n_basic); idx_l: (rows_local, order).
        v = p_local[..., idx_l]                       # (t, r, o)
        v = jnp.where(neg_l, 1.0 - v, v)
        v = jnp.where(mask_l, v, 1.0)
        q = jnp.prod(v, axis=-1) * alive_l            # (t, r)
        partial_sum = jnp.sum(q, axis=-1)
        partial_log = jnp.sum(jnp.log1p(-jnp.minimum(q, 1.0 - 1e-18)),
                              axis=-1)
        partial_sum = jax.lax.psum(partial_sum, "model")
        partial_log = jax.lax.psum(partial_log, "model")
        return jnp.minimum(partial_sum, 1.0), -jnp.expm1(partial_log)

    sharded = shard_map(
        local_partial, mesh=mesh,
        in_specs=(P("data", None), P("model", None), P("model", None),
                  P("model", None), P("model")),
        out_specs=(P("data"), P("data")))

    @jax.jit
    def quantify(basic_p):
        return sharded(basic_p, idx_j, neg_j, mask_j,
                       alive_j.astype(basic_p.dtype))

    return quantify


def sharded_stream_step(program, mesh: Mesh,
                        house_states: np.ndarray,
                        interpret: bool = False,
                        _local_override=None):
    """Data-parallel streaming propagation: jitted
    ``(basic_p_batch) -> per-trial top probabilities``.

    The flagship big-structured-tree engine (``ops/stream_kernel``) under
    explicit ``shard_map``: Pallas calls do not auto-partition under
    GSPMD, so the trials axis is sharded over the full mesh and each
    device streams its own trial tiles through its VMEM pool — pure data
    parallelism, no collectives (the per-trial outputs concatenate).
    Staging (``stage_basic``) runs GSPMD-sharded on the same axis first.

    The global trial count must give every device a whole number of
    (8, 128) tiles: ``n_trials % (1024 * mesh.size) == 0``.
    """
    from ..ops.stream_kernel import stage_basic, stream_propagate_staged

    axes = tuple(mesh.axis_names)
    n_dev = int(mesh.devices.size)
    nbp = program.n_basic_pad

    def local(staged_local):
        return stream_propagate_staged(program, staged_local, house_states,
                                       interpret=interpret)

    if _local_override is not None:  # Testing hook (sharding plumbing).
        local = _local_override

    # check_vma must be off: pallas_call's out_shape carries no
    # varying-mesh-axes annotation (the kernel is purely per-shard).
    sharded = shard_map(local, mesh=mesh, in_specs=P(axes, None, None),
                        out_specs=P(axes), check_vma=False)

    @jax.jit
    def step(basic_p):
        n_trials = basic_p.shape[0]
        if n_trials % (1024 * n_dev):
            raise LogicError(
                f"sharded stream step needs n_trials % "
                f"{1024 * n_dev} == 0 (whole tiles per device)")
        staged = stage_basic(program, basic_p)
        # Shard boundaries must align with per-trial-tile blocks of the
        # staged layout (each block is n_basic_pad rows).
        assert (staged.shape[0] // n_dev) % nbp == 0
        return sharded(staged)

    return step


def sharded_replay_step(program, mesh: Mesh,
                        house_states: np.ndarray,
                        interpret: bool = False,
                        _local_override=None):
    """Data-parallel replay-stream propagation: jitted
    ``(basic_p_batch) -> per-trial top probabilities``.

    The flagship big-THRASHING-tree engine (``compiler/replay.py``)
    under explicit ``shard_map``: staging (``stage_replay`` — one GSPMD
    gather over the sharded trials axis) lays the per-read basic stream
    out per trial tile, each device streams its own tile blocks through
    its VMEM pool + slab ring, and the per-trial outputs concatenate —
    pure data parallelism, no collectives.  Same tile-alignment
    contract as :func:`sharded_stream_step`; shard boundaries align
    with per-trial-tile blocks of ``brs_len_pad`` rows.
    """
    from ..ops.stream_kernel import replay_propagate_staged, stage_replay

    axes = tuple(mesh.axis_names)
    n_dev = int(mesh.devices.size)
    blp = program.brs_len_pad

    def local(staged_local):
        return replay_propagate_staged(program, staged_local,
                                       house_states, interpret=interpret)

    if _local_override is not None:  # Testing hook (sharding plumbing).
        local = _local_override

    sharded = shard_map(local, mesh=mesh, in_specs=P(axes, None, None),
                        out_specs=P(axes), check_vma=False)

    @jax.jit
    def step(basic_p):
        n_trials = basic_p.shape[0]
        if n_trials % (1024 * n_dev):
            raise LogicError(
                f"sharded replay step needs n_trials % "
                f"{1024 * n_dev} == 0 (whole tiles per device)")
        staged = stage_replay(program, basic_p)
        assert (staged.shape[0] // n_dev) % blp == 0
        return sharded(staged)

    return step


def sharded_stream_grad_step(aprog, mesh: Mesh,
                             house_states: np.ndarray,
                             interpret: bool = False,
                             _local_override=None):
    """Data-parallel importance backward: jitted
    ``(basic_p_batch) -> (per-trial tops, grad_basic)``.

    The adjoint stream program (``ops/adjoint_kernel``) under explicit
    ``shard_map``: each device runs its own taped forward + reversed
    backward over its trial tiles (one ``jax.vjp``, no collectives —
    per-trial tops and per-trial basic gradients concatenate).  The
    importance analysis path's sharding plumbing, data-parallel.

    Same tile-alignment contract as :func:`sharded_stream_step`.
    """
    from ..ops.adjoint_kernel import make_differentiable_stream
    from ..ops.stream_kernel import stage_basic, unstage_basic

    axes = tuple(mesh.axis_names)
    n_dev = int(mesh.devices.size)
    program = aprog.base
    nbp = program.n_basic_pad
    f = make_differentiable_stream(aprog, house_states,
                                   interpret=interpret)

    def local(staged_local):
        tops, vjp = jax.vjp(f, staged_local)
        (g_staged,) = vjp(jnp.ones_like(tops))
        return tops, g_staged

    if _local_override is not None:  # Testing hook (sharding plumbing).
        local = _local_override

    sharded = shard_map(local, mesh=mesh, in_specs=P(axes, None, None),
                        out_specs=(P(axes), P(axes, None, None)),
                        check_vma=False)

    @jax.jit
    def step(basic_p):
        n_trials = basic_p.shape[0]
        if n_trials % (1024 * n_dev):
            raise LogicError(
                f"sharded stream grad step needs n_trials % "
                f"{1024 * n_dev} == 0 (whole tiles per device)")
        staged = stage_basic(program, basic_p)
        assert (staged.shape[0] // n_dev) % nbp == 0
        tops, g_staged = sharded(staged)
        # stage_basic is a pure permutation: its transpose is the
        # inverse permutation, so the basic-space gradient is one
        # unstage of the staged-space cotangent.
        return tops, unstage_basic(program, g_staged)

    return step
