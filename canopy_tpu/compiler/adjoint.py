"""Adjoint (reverse-mode) schedule for the streaming engine.

Importance analysis is one reverse-mode pass (``engine/importance.py``),
but autodiff only reaches the gather engine — on models where the stream
or BDD-mux-stream engines are orders faster, the backward pass was the
bottleneck.  This module compiles a :class:`~.schedule.StreamProgram`
into an explicit adjoint program executed by
``ops/adjoint_kernel.py`` at the streaming kernel's rate:

* **Forward tape**: the forward program is replayed with one addition —
  every gate's argument tiles are copied into a double-buffered VMEM
  slab that flushes to an HBM *tape* in coalesced DMAs.  Because values
  are taped in read order, the tape is perfectly sequential: writes
  stream at full bandwidth, and the backward pass re-reads it as a
  straight reversed stream (no scattered refills).
* **Backward**: gates run in reverse.  Argument values come from a
  ring of tape chunks DMA'd in descending order; the adjoint of each
  gate output lives in a VMEM pool indexed by the *same slot* the
  forward value had — forward liveness intervals mirror exactly into
  backward adjoint liveness, so the forward linear-scan allocation is
  reused verbatim (no second allocator).  A value's first backward
  touch (its last forward consumer) stores, later touches accumulate.
* **Basic-event gradients** accumulate in a gradient-staging ring that
  mirrors the forward staging windows: a chunk's buffer is zeroed at
  the reversed position of the ring-successor's DMA start (provably
  before any accumulation lands), and flushed to the gradient output
  at the reversed position of its own DMA wait (provably after all).
  Spilled basics route through their adjoint pool slot and are copied
  into the staging buffer at the reversed spill point.

Per-gate adjoint math (``x_j`` is the post-complement argument value):

* prod — d out/d x_i = prod_{j != i} x_j, computed with the zero-robust
  quotient form (count zeros; divide the full product, or substitute
  the nonzero product when exactly one factor is zero).
* pair (xor/iff) — d/d x_0 = 1 - 2 x_1 and symmetrically.
* count (atleast/cardinality) — d P/d x_i = P(S_-i in [lo-1, hi-1]) -
  P(S_-i in [lo, hi]), each leave-one-out Poisson-binomial DP unrolled
  statically (count gates are narrow in practice; a width guard falls
  back to the gather engine's autodiff).
* mux (BDD Shannon node) — d/dp = hi - lo, d/d hi = p, d/d lo = 1 - p,
  so the exact-BDD evaluator differentiates at kernel speed too.

Everything here is host-side scheduling; ``simulate_adjoint_program``
executes both op lists on scalars with async-DMA hazard checking so
schedules validate on CPU without a TPU (the same methodology that
caught the spill tier's refill-FIFO race, ``compiler/spill.py``).

Reference anchor: importance analysis is a first-class Settings
capability (``/root/reference/src/mef/openpsa/settings.h:262-278``);
the reference never built its engine, let alone an adjoint of it.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..errors import LogicError
from .schedule import _TILE_BYTES, _VMEM_BUDGET, StreamProgram

__all__ = ["AdjointProgram", "build_adjoint_schedule",
           "simulate_adjoint_program"]

#: Leave-one-out DP width guard: F*(F-1)*cap unrolled ops per count gate.
_MAX_COUNT_BWD_OPS = 4096


@dataclasses.dataclass
class AdjointProgram:
    """Forward-with-tape + backward op lists for a stream program.

    ``fwd_ops`` extends the :class:`StreamProgram` grammar with:

    - ``("tput", loc, slab_buf, slab_off)`` — copy the value at ``loc``
      (pool/stage/house form, as in gate args) into the tape slab.
    - ``("tfstart"/"tfwait", slab_buf, n, row0)`` — flush slab rows
      ``[0, n)`` of ``slab_buf`` to tape rows ``[row0, row0+n)``
      (semaphore = ``slab_buf``).

    ``bwd_ops`` grammar (all indices static):

    - ``("binit",)`` — adjoint pool slot of the top value := cotangent.
    - ``("tstart"/"twait", k, buf, n)`` — DMA tape chunk ``k`` (``n``
      rows) into ring buffer ``buf``.
    - ``("gzero", buf)`` — zero gradient-staging buffer ``buf``.
    - ``("gfstart"/"gfwait", c, buf)`` — flush gradient-staging buffer
      ``buf`` to the gradient rows of basic chunk ``c``.
    - ``("zflush", c)`` — zero buffer 0 and flush it to inactive basic
      chunk ``c`` (emitted at the head, before the ring runs).
    - ``("gspill", buf, off, slot)`` — reversed spill: staging-buffer
      gradient position := adjoint pool slot ``slot``.
    - ``("bgate", kind, out_slot, bargs, aux)`` — propagate the adjoint
      in pool slot ``out_slot`` to the args.  ``bargs`` is a list of
      ``(vloc, gloc, neg)``: ``vloc`` is ``("tape", buf, off)`` or
      ``("house", pos)`` (forward value source), ``gloc`` is
      ``("apool", slot, first)`` / ``("gstage", buf, off, first)`` /
      ``None`` (house: no gradient), ``neg`` the forward complement.
    """

    base: StreamProgram
    fwd_ops: list
    bwd_ops: list
    tape_rows: int
    tape_chunk_tiles: int
    n_tape_chunks: int
    n_tbufs: int
    slab_tiles: int
    n_inactive_chunks: int

    @property
    def bwd_vmem_bytes(self) -> int:
        ring = min(self.n_tape_chunks, self.n_tbufs) * self.tape_chunk_tiles
        gbufs = min(self.base.n_chunks, self.base.n_bufs)
        return (ring + gbufs * self.base.chunk_tiles
                + self.base.pool_slots) * _TILE_BYTES

    @property
    def fwd_vmem_bytes(self) -> int:
        return self.base.vmem_bytes + 2 * self.slab_tiles * _TILE_BYTES


def _resolve_values(ops, n_bufs):
    """Value-number the pool slots of a forward op list.

    Returns per-op resolved gate entries and spill entries; stage locs
    are canonicalized to ``("stage", chunk, off)`` (the op form carries
    the ring buffer, which is ambiguous across reuse).
    """
    buf_chunk = {}
    cur_val: dict[int, int] = {}      # pool slot -> value id
    val_slot: list[int] = []          # value id -> pool slot
    entries = []                      # (op_idx, kind_tag, payload)
    for idx, op in enumerate(ops):
        tag = op[0]
        if tag == "wait":
            buf_chunk[op[2]] = op[1]
            entries.append((idx, "wait", (op[1], op[2])))
        elif tag == "start":
            entries.append((idx, "start", (op[1], op[2])))
        elif tag == "spill":
            _t, buf, off, slot = op
            v = len(val_slot)
            val_slot.append(slot)
            cur_val[slot] = v
            entries.append((idx, "spill",
                            (buf_chunk[buf], off, slot, v)))
        else:  # gate
            _t, kind, out_slot, locs, aux = op
            rargs = []
            for loc, flag in locs:
                if loc[0] == "pool":
                    rargs.append((("val", cur_val[loc[1]]), flag))
                elif loc[0] == "stage":
                    rargs.append((("stage", buf_chunk[loc[1]], loc[2]),
                                  flag))
                else:
                    rargs.append((loc, flag))
            v = len(val_slot)
            val_slot.append(out_slot)
            cur_val[out_slot] = v
            entries.append((idx, "gate", (kind, out_slot, v, rargs, aux)))
    return entries, val_slot, cur_val


def build_adjoint_schedule(program: StreamProgram,
                           slab_tiles: int = 128,
                           n_tbufs: int = 3,
                           tape_chunk_tiles: int | None = None,
                           vmem_budget: int = _VMEM_BUDGET
                           ) -> AdjointProgram:
    """Compile the adjoint of ``program``.

    Raises :class:`LogicError` when no valid adjoint schedule fits the
    VMEM budget (callers fall back to the gather engine's autodiff).
    """
    ops = program.ops
    entries, val_slot, cur_val = _resolve_values(ops, program.n_bufs)
    if program.top_slot not in cur_val:
        raise LogicError("adjoint: top slot carries no value")
    top_val = cur_val[program.top_slot]

    gate_entries = [(i, e) for i, (_idx, t, e) in enumerate(entries)
                    if t == "gate"]

    # Adjoint-reachability: a gate's backward runs iff its output's
    # adjoint can be nonzero (top, or feeds a reachable gate).
    reach: set[int] = {top_val}
    eligible: dict[int, bool] = {}
    for ei in range(len(entries) - 1, -1, -1):
        _idx, tag, e = entries[ei]
        if tag != "gate":
            continue
        kind, _out_slot, v, rargs, _aux = e
        ok = v in reach and kind != "fill"
        eligible[ei] = ok
        if ok:
            for loc, _f in rargs:
                if loc[0] == "val":
                    reach.add(loc[1])

    # Count-gate backward width guard.
    for ei, (_idx, tag, e) in enumerate(entries):
        if tag == "gate" and eligible.get(ei):
            kind, _o, _v, rargs, aux = e
            if kind == "count":
                F = len(rargs)
                if F * (F - 1) * (aux[1] + 1) > _MAX_COUNT_BWD_OPS:
                    raise LogicError(
                        f"adjoint: count gate of fan-in {F} exceeds the "
                        "leave-one-out unroll guard — use the gather "
                        "engine for gradients")

    # First-backward-touch per value / per stage position: the LAST
    # eligible forward consumer occurrence stores, the rest accumulate.
    last_occ_val: dict[int, tuple[int, int]] = {}
    last_occ_stage: dict[tuple[int, int], tuple[int, int]] = {}
    for ei, (_idx, tag, e) in enumerate(entries):
        if tag != "gate" or not eligible.get(ei):
            continue
        _k, _o, _v, rargs, _a = e
        for ai, (loc, _f) in enumerate(rargs):
            if loc[0] == "val":
                prev = last_occ_val.get(loc[1])
                if prev is None or ei > prev[0]:
                    last_occ_val[loc[1]] = (ei, ai)
            elif loc[0] == "stage":
                key = (loc[1], loc[2])
                prev = last_occ_stage.get(key)
                if prev is None or ei > prev[0]:
                    last_occ_stage[key] = (ei, ai)

    # ---- forward pass: original ops + tape puts + slab flushes ------
    fwd_ops: list = []
    tape_pos_of: dict[tuple[int, int], int] = {}   # (entry, arg) -> row
    sbuf, soff, next_row, batch_row0 = 0, 0, 0, 0
    slab_pending: list[tuple | None] = [None, None]   # last tfstart args

    def flush_slab():
        nonlocal sbuf, soff, batch_row0
        if soff:
            fwd_ops.append(("tfstart", sbuf, soff, batch_row0))
            slab_pending[sbuf] = (soff, batch_row0)
        sbuf ^= 1
        soff = 0
        batch_row0 = next_row
        if slab_pending[sbuf] is not None:
            # Reuse of the other buffer: its flush must have landed.
            n, row0 = slab_pending[sbuf]
            fwd_ops.append(("tfwait", sbuf, n, row0))
            slab_pending[sbuf] = None

    for ei, (idx, tag, e) in enumerate(entries):
        if tag == "gate" and eligible.get(ei):
            _k, _o, _v, rargs, _a = e
            for ai, (loc, _f) in enumerate(rargs):
                if loc[0] == "house":
                    continue
                if soff == slab_tiles:
                    flush_slab()
                orig_loc = ops[idx][3][ai][0]   # pool/stage buf form
                fwd_ops.append(("tput", orig_loc, sbuf, soff))
                tape_pos_of[(ei, ai)] = next_row
                soff += 1
                next_row += 1
        fwd_ops.append(ops[idx])
    if soff:
        fwd_ops.append(("tfstart", sbuf, soff, batch_row0))
        slab_pending[sbuf] = (soff, batch_row0)
    for b in (0, 1):
        if slab_pending[b] is not None:
            n, row0 = slab_pending[b]
            fwd_ops.append(("tfwait", b, n, row0))

    tape_rows = next_row
    if tape_rows == 0:
        raise LogicError("adjoint: nothing to differentiate")

    # Tape chunking — shrink the ring for big pools to stay in budget.
    budget_tiles = vmem_budget // _TILE_BYTES
    gbufs = min(program.n_chunks, program.n_bufs)
    avail = budget_tiles - gbufs * program.chunk_tiles \
        - program.pool_slots
    if tape_chunk_tiles is None:
        tape_chunk_tiles = min(256, max(avail // n_tbufs, 0))
        tape_chunk_tiles = max(32, tape_chunk_tiles)
    tct = tape_chunk_tiles
    n_tchunks = -(-tape_rows // tct)
    ring_tiles = min(n_tchunks, n_tbufs) * tct
    if ring_tiles + gbufs * program.chunk_tiles + program.pool_slots \
            > budget_tiles:
        raise LogicError(
            "adjoint: backward working set exceeds the VMEM budget "
            f"(ring {ring_tiles} + staging "
            f"{gbufs * program.chunk_tiles} + pool "
            f"{program.pool_slots} tiles)")

    def tchunk_rows(k: int) -> int:
        return min(tct, tape_rows - k * tct)

    # ---- backward pass ----------------------------------------------
    n_active = program.n_chunks
    raw: list = [("binit",)]
    for k in range(max(n_active - program.n_bufs, 0), n_active):
        raw.append(("gzero", k % program.n_bufs))

    for ei in range(len(entries) - 1, -1, -1):
        _idx, tag, e = entries[ei]
        if tag == "start":
            c, buf = e
            raw.append(("gfwait", c, buf))
            if c - program.n_bufs >= 0:
                raw.append(("gzero", buf))
        elif tag == "wait":
            c, buf = e
            raw.append(("gfstart", c, buf))
        elif tag == "spill":
            chunk, off, slot, v = e
            if v in reach:
                raw.append(("gspill", chunk % program.n_bufs, off, slot))
        else:  # gate
            if not eligible.get(ei):
                continue
            kind, out_slot, v, rargs, aux = e
            bargs = []
            for ai, (loc, flag) in enumerate(rargs):
                if loc[0] == "house":
                    bargs.append(((loc), None, flag))
                    continue
                row = tape_pos_of[(ei, ai)]
                vloc = ("tape", row // tct, row % tct)
                if loc[0] == "stage":
                    chunk, off = loc[1], loc[2]
                    first = last_occ_stage[(chunk, off)] == (ei, ai)
                    gloc = ("gstage", chunk % program.n_bufs, off, first)
                elif loc[0] == "val":
                    first = last_occ_val[loc[1]] == (ei, ai)
                    gloc = ("apool", val_slot[loc[1]], first)
                bargs.append((vloc, gloc, flag))
            raw.append(("bgate", kind, out_slot, bargs, aux))

    # Tape ring events: reads are monotone non-increasing in chunk.
    first_read = [len(raw)] * n_tchunks
    last_read = [-1] * n_tchunks
    for pos, op in enumerate(raw):
        if op[0] == "bgate":
            for vloc, _g, _f in op[3]:
                if vloc[0] == "tape":
                    k = vloc[1]
                    first_read[k] = min(first_read[k], pos)
                    last_read[k] = max(last_read[k], pos)
    starts_before: dict[int, list[int]] = {}
    waits_before: dict[int, list[int]] = {}
    for k in range(n_tchunks - 1, -1, -1):
        if last_read[k] < 0:
            continue                      # never read (ineligible gates)
        if k + n_tbufs >= n_tchunks or last_read[k + n_tbufs] < 0:
            at = 0
        else:
            at = last_read[k + n_tbufs] + 1
        w = first_read[k]
        if at > w:
            raise LogicError(
                f"adjoint: tape chunk {k} needed at op {w} but its ring "
                f"buffer frees at op {at} (gate arg block spans over "
                f"{n_tbufs} tape chunks) — use the gather engine")
        starts_before.setdefault(at, []).append(k)
        waits_before.setdefault(w, []).append(k)

    bwd_ops: list = []
    # Inactive basic chunks (beyond the active prefix) still own
    # gradient rows: zero-fill them before the ring runs.
    n_layout_chunks = program.n_basic_pad // program.chunk_tiles
    n_inactive = n_layout_chunks - n_active
    for c in range(n_active, n_layout_chunks):
        bwd_ops.append(("zflush", c))
    for pos, op in enumerate(raw):
        for k in sorted(starts_before.get(pos, ()), reverse=True):
            bwd_ops.append(("tstart", k, k % n_tbufs, tchunk_rows(k)))
        for k in sorted(waits_before.get(pos, ()), reverse=True):
            bwd_ops.append(("twait", k, k % n_tbufs, tchunk_rows(k)))
        bwd_ops.append(op)
    # Convert bgate vlocs chunk -> ring buffer now that events exist.
    for i, op in enumerate(bwd_ops):
        if op[0] == "bgate":
            bargs = [((("tape", vloc[1] % n_tbufs, vloc[2])
                       if vloc[0] == "tape" else vloc), gloc, f)
                     for vloc, gloc, f in op[3]]
            bwd_ops[i] = (op[0], op[1], op[2], bargs, op[4])

    return AdjointProgram(
        base=program, fwd_ops=fwd_ops, bwd_ops=bwd_ops,
        tape_rows=tape_rows, tape_chunk_tiles=tct,
        n_tape_chunks=n_tchunks, n_tbufs=n_tbufs,
        slab_tiles=slab_tiles, n_inactive_chunks=n_inactive)


# ---------------------------------------------------------------------------
# Host-side scalar reference interpreter with async-hazard checking.


def _f32(x):
    return np.float32(x)


def _gate_scalar(read, kind, locs, aux):
    one = _f32(1.0)
    if kind == "prod":
        acc = one
        for loc, flip in locs:
            v = read(loc)
            acc = acc * ((one - v) if flip else v)
        return one - acc if aux else acc
    if kind == "pair":
        (l0, f0), (l1, f1) = locs
        a = one - read(l0) if f0 else read(l0)
        b = one - read(l1) if f1 else read(l1)
        x = a + b - _f32(2.0) * a * b
        return one - x if aux else x
    if kind == "mux":
        (lp, _), (lh, _), (ll, _) = locs
        p = read(lp)
        return p * read(lh) + (one - p) * read(ll)
    if kind == "fill":
        return _f32(aux)
    lo, hi = aux
    cap = hi + 1
    dp = [one] + [_f32(0.0)] * cap
    for loc, neg in locs:
        v = read(loc)
        if neg:
            v = one - v
        new = [dp[0] * (one - v)]
        for k in range(1, cap):
            new.append(dp[k] * (one - v) + dp[k - 1] * v)
        new.append(dp[cap] + dp[cap - 1] * v)
        dp = new[:cap] + [new[cap]]
    return _f32(sum(dp[k] for k in range(lo, hi + 1)))


def _bgate_partials(kind, xs, aux):
    """d out / d x_i in float64 (host reference), xs post-complement."""
    F = len(xs)
    if kind == "prod":
        parts = []
        for i in range(F):
            p = 1.0
            for j in range(F):
                if j != i:
                    p *= xs[j]
            parts.append(-p if aux else p)
        return parts
    if kind == "pair":
        s = -1.0 if aux else 1.0
        return [s * (1.0 - 2.0 * xs[1]), s * (1.0 - 2.0 * xs[0])]
    if kind == "mux":
        p, hi, lo = xs
        return [hi - lo, p, 1.0 - p]
    lo_n, hi_n = aux
    parts = []
    for i in range(F):
        dp = [1.0]
        for j in range(F):
            if j == i:
                continue
            v = xs[j]
            new = [dp[0] * (1.0 - v)]
            for k in range(1, len(dp)):
                new.append(dp[k] * (1.0 - v) + dp[k - 1] * v)
            new.append(dp[-1] * v)
            dp = new
        def mass(a, b):
            return sum(dp[k] for k in range(max(a, 0), min(b, len(dp) - 1) + 1))
        parts.append(mass(lo_n - 1, hi_n - 1) - mass(lo_n, hi_n))
    return parts


def simulate_adjoint_program(aprog: AdjointProgram, basic_p: np.ndarray,
                             house: np.ndarray, ct: float = 1.0):
    """Execute fwd+bwd op lists on scalars with DMA hazard checking.

    Returns ``(top_value, grad_basic)`` for one trial; the forward value
    matches the stream kernel bit-for-bit (f32, same reduction order),
    the gradient is a float64 host reference for the backward schedule.
    """
    prog = aprog.base
    n_b = prog.n_basic
    staged = np.zeros(prog.n_basic_pad, dtype=np.float32)
    staged[:n_b] = np.asarray(basic_p, dtype=np.float32)[prog.basic_perm]
    ctile = prog.chunk_tiles

    stage = np.full((prog.n_bufs, ctile), np.nan, dtype=np.float32)
    stage_ok = [False] * prog.n_bufs
    pend_chunk: dict[int, tuple[int, np.ndarray]] = {}
    pool = np.full(prog.pool_slots, np.nan, dtype=np.float32)
    slab = np.full((2, aprog.slab_tiles), np.nan, dtype=np.float32)
    tape = np.full(aprog.tape_rows, np.nan, dtype=np.float32)
    tape_ok = np.zeros(aprog.tape_rows, dtype=bool)
    pend_flush: dict[int, tuple[int, int, np.ndarray]] = {}

    def read(loc):
        if loc[0] == "pool":
            v = pool[loc[1]]
            assert not np.isnan(v), f"undefined pool slot {loc[1]}"
            return v
        if loc[0] == "stage":
            buf = loc[1]
            assert stage_ok[buf] and buf not in pend_chunk, \
                f"read of unready staging buffer {buf}"
            return stage[buf, loc[2]]
        return np.float32(house[loc[1]])

    for op in aprog.fwd_ops:
        tag = op[0]
        if tag == "start":
            c, buf = op[1], op[2]
            assert buf not in pend_chunk
            pend_chunk[buf] = (c, staged[c * ctile:(c + 1) * ctile].copy())
        elif tag == "wait":
            c, buf = op[1], op[2]
            pc, data = pend_chunk.pop(buf)
            assert pc == c
            stage[buf, :len(data)] = data
            stage_ok[buf] = True
        elif tag == "spill":
            pool[op[3]] = stage[op[1], op[2]]
        elif tag == "tput":
            _t, loc, sb, so = op
            assert sb not in pend_flush, \
                f"tput into slab buffer {sb} with an in-flight flush"
            slab[sb, so] = read(loc)
        elif tag == "tfstart":
            _t, sb, n, row0 = op
            assert sb not in pend_flush
            pend_flush[sb] = (n, row0, slab[sb, :n].copy())
        elif tag == "tfwait":
            _t, sb, n, row0 = op
            pn, prow0, data = pend_flush.pop(sb)
            assert (pn, prow0) == (n, row0)
            tape[row0:row0 + n] = data
            tape_ok[row0:row0 + n] = True
        else:
            _t, kind, out_slot, locs, aux = op
            pool[out_slot] = _gate_scalar(read, kind, locs, aux)
    assert not pend_chunk and not pend_flush, \
        "forward DMAs cross the kernel boundary"
    top = float(pool[prog.top_slot])

    # ---- backward ----
    tct = aprog.tape_chunk_tiles
    tring = np.full((aprog.n_tbufs, tct), np.nan)
    tring_ok = [False] * aprog.n_tbufs
    pend_tape: dict[int, tuple[int, np.ndarray]] = {}
    gstage = np.full((min(prog.n_chunks, prog.n_bufs) or 1,
                      ctile), np.nan)
    adj = np.full(prog.pool_slots, np.nan)
    grad_staged = np.full(prog.n_basic_pad, np.nan)
    pend_gflush: dict[int, tuple[int, np.ndarray]] = {}

    def vread(vloc):
        if vloc[0] == "tape":
            buf = vloc[1]
            assert tring_ok[buf] and buf not in pend_tape, \
                f"read of unready tape ring buffer {buf}"
            return float(tring[buf, vloc[2]])
        return float(house[vloc[1]])

    for op in aprog.bwd_ops:
        tag = op[0]
        if tag == "binit":
            adj[prog.top_slot] = ct
        elif tag == "zflush":
            c = op[1]
            grad_staged[c * ctile:(c + 1) * ctile] = 0.0
        elif tag == "tstart":
            _t, k, buf, n = op
            assert buf not in pend_tape
            assert tape_ok[k * tct:k * tct + n].all(), \
                f"tape chunk {k} read before its flush landed"
            pend_tape[buf] = (k, tape[k * tct:k * tct + n].copy())
        elif tag == "twait":
            _t, k, buf, n = op
            pk, data = pend_tape.pop(buf)
            assert pk == k
            tring[buf, :n] = data
            tring_ok[buf] = True
        elif tag == "gzero":
            buf = op[1]
            assert buf not in pend_gflush, \
                f"gzero of buffer {buf} with an in-flight flush"
            gstage[buf, :] = 0.0
        elif tag == "gfstart":
            _t, c, buf = op
            assert buf not in pend_gflush
            pend_gflush[buf] = (c, gstage[buf].copy())
        elif tag == "gfwait":
            _t, c, buf = op
            if buf in pend_gflush:
                pc, data = pend_gflush.pop(buf)
                assert pc == c
                grad_staged[c * ctile:(c + 1) * ctile] = data
        elif tag == "gspill":
            _t, buf, off, slot = op
            assert buf not in pend_gflush
            v = adj[slot]
            assert not np.isnan(v), "gspill of an unformed adjoint"
            gstage[buf, off] = v
        else:  # bgate
            _t, kind, out_slot, bargs, aux = op
            a = adj[out_slot]
            assert not np.isnan(a), \
                f"bgate reads unformed adjoint slot {out_slot}"
            xs = []
            for vloc, _g, neg in bargs:
                v = vread(vloc)
                xs.append(1.0 - v if neg else v)
            parts = _bgate_partials(kind, xs, aux)
            for (vloc, gloc, neg), dx in zip(bargs, parts):
                if gloc is None:
                    continue
                g = (-dx if neg and kind != "mux" else dx) * a
                if gloc[0] == "apool":
                    _ag, slot, firstq = gloc
                    if firstq:
                        adj[slot] = g
                    else:
                        assert not np.isnan(adj[slot]), \
                            f"accumulate into unformed adjoint {slot}"
                        adj[slot] += g
                else:
                    _gg, buf, off, firstq = gloc
                    assert buf not in pend_gflush, \
                        "gstage accumulate during an in-flight flush"
                    assert not np.isnan(gstage[buf, off]), \
                        "gstage accumulate before gzero"
                    gstage[buf, off] += g
    assert not pend_gflush, \
        "gradient flush DMA unwaited at kernel end"
    assert not pend_tape, "tape DMA crosses the kernel boundary"

    grad_staged = np.nan_to_num(grad_staged, nan=0.0)
    inv = np.empty(n_b, dtype=np.int64)
    inv[prog.basic_perm] = np.arange(n_b)
    return top, grad_staged[:n_b][inv]
