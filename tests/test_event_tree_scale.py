"""Event-tree quantification at plant scale: 64 sequences through one
shared compile + ONE BDD forest pass (``compiler/bdd.build_bdd_multi``).

The model is six binary functional-event forks (2^6 = 64 sequences),
each linked to its own two-basic fault tree plus one *shared* basic
event across all trees (so bottom-up propagation alone would be
approximate and the BDD path is load-bearing). Correctness anchor:
exact per-sequence probabilities by full 2^13 state enumeration through
the propagation engine on 0/1 inputs (independent of the BDD)."""

import time

import jax.numpy as jnp
import numpy as np
import pytest

import canopy_tpu.compiler.bdd as bdd_mod
from canopy_tpu.engine.analysis import RiskAnalysis
from canopy_tpu.mef import Initializer
from canopy_tpu.settings import Settings

from helpers import build_model

N_FE = 6


def plant_xml() -> str:
    lines = ['<?xml version="1.0"?>', '<opsa-mef name="big-plant">',
             '  <define-initiating-event name="IE" event-tree="ET"/>',
             '  <define-event-tree name="ET">']
    for k in range(N_FE):
        lines.append(f'    <define-functional-event name="FE{k}"/>')
    for s in range(2 ** N_FE):
        lines.append(f'    <define-sequence name="seq{s}"/>')

    def fork(k: int, path_bits: int) -> str:
        if k == N_FE:
            return f'<sequence name="seq{path_bits}"/>'
        succ = fork(k + 1, path_bits)
        fail = fork(k + 1, path_bits | (1 << k))
        return (f'<fork functional-event="FE{k}">'
                f'<path state="success">'
                f'<collect-formula><not><gate name="g{k}"/></not>'
                f'</collect-formula>{succ}</path>'
                f'<path state="failure">'
                f'<collect-formula><gate name="g{k}"/></collect-formula>'
                f'{fail}</path></fork>')

    lines.append('    <initial-state>' + fork(0, 0) + '</initial-state>')
    lines.append('  </define-event-tree>')
    for k in range(N_FE):
        lines.append(f'  <define-fault-tree name="FT{k}">')
        lines.append(
            f'    <define-gate name="g{k}"><or>'
            f'<basic-event name="a{k}"/><basic-event name="b{k}"/>'
            f'<basic-event name="common"/></or></define-gate>')
        lines.append(f'    <define-basic-event name="a{k}">'
                     f'<float value="{0.02 + 0.01 * k:.3f}"/>'
                     f'</define-basic-event>')
        lines.append(f'    <define-basic-event name="b{k}">'
                     f'<float value="{0.05 + 0.005 * k:.3f}"/>'
                     f'</define-basic-event>')
        lines.append('  </define-fault-tree>')
    lines.append('  <model-data><define-basic-event name="common">'
                 '<float value="0.01"/></define-basic-event></model-data>')
    lines.append('</opsa-mef>')
    return "\n".join(lines)


@pytest.fixture(scope="module")
def report_and_counts():
    model = build_model(plant_xml(),
                        Settings().probability_analysis(True))
    calls = {"root_counts": []}
    original = bdd_mod.build_bdd_multi

    def counting(tree, root_slots, *args, **kwargs):
        calls["root_counts"].append(len(root_slots))
        return original(tree, root_slots, *args, **kwargs)

    bdd_mod.build_bdd_multi = counting
    try:
        t0 = time.perf_counter()
        analysis = RiskAnalysis(model, Settings().probability_analysis(True))
        report = analysis.run()
        elapsed = time.perf_counter() - t0
    finally:
        bdd_mod.build_bdd_multi = original
    return report, calls, elapsed, analysis


def brute_sequences():
    """Exact per-sequence probabilities by 2^13 enumeration."""
    p_a = np.array([0.02 + 0.01 * k for k in range(N_FE)])
    p_b = np.array([0.05 + 0.005 * k for k in range(N_FE)])
    p_c = 0.01
    probs = np.concatenate([p_a, p_b, [p_c]])
    n = len(probs)
    ids = np.arange(1 << n, dtype=np.uint64)
    bits = ((ids[:, None] >> np.arange(n, dtype=np.uint64)) & np.uint64(1)
            ).astype(np.float64)
    weight = np.prod(np.where(bits == 1.0, probs, 1 - probs), axis=1)
    gk = np.stack([
        1 - (1 - bits[:, k]) * (1 - bits[:, N_FE + k]) * (1 - bits[:, -1])
        for k in range(N_FE)], axis=1)      # (S, N_FE) 0/1 gate values
    out = np.zeros(1 << N_FE)
    for s in range(1 << N_FE):
        cond = np.ones(1 << n)
        for k in range(N_FE):
            cond = cond * (gk[:, k] if (s >> k) & 1 else 1 - gk[:, k])
        out[s] = float((cond * weight).sum())
    return out


class TestEventTreeScale:
    def test_64_sequences_one_forest_pass(self, report_and_counts):
        report, calls, _elapsed, _an = report_and_counts
        assert len(report.sequences) == 64
        # All 64 sequences share one house configuration -> exactly ONE
        # 64-root forest pass (the other passes are the six standalone
        # fault-tree analyses, one root each).
        assert calls["root_counts"].count(64) == 1
        assert all(c in (1, 64) for c in calls["root_counts"])

    def test_sequences_partition_and_match_brute_force(
            self, report_and_counts):
        report, _calls, _elapsed, _an = report_and_counts
        got = {s.sequence: s.probability for s in report.sequences}
        total = sum(got.values())
        assert abs(total - 1.0) < 1e-9      # exhaustive forks partition
        want = brute_sequences()
        for s in range(64):
            assert got[f"seq{s}"] == pytest.approx(want[s], abs=1e-11), s

    def test_phase_timing_recorded(self, report_and_counts):
        _report, _calls, elapsed, analysis = report_and_counts
        # The whole 64-sequence analysis (shared compile + one forest +
        # 64 schedules/evaluations) stays interactive; the pre-batched
        # code rebuilt 64 forests and scaled linearly in sequences.
        assert elapsed < 60.0
        assert any(k.startswith("event-tree:")
                   for k in analysis._timings)
