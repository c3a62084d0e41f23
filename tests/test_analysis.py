"""Integration tests: the full RiskAnalysis driver on the demo plant."""

import json
import math
import os

import pytest

from canopy_tpu.mef import Initializer
from canopy_tpu.engine.analysis import RiskAnalysis
from canopy_tpu.settings import Settings

from helpers import build_model

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "demo_plant.xml")


def load_demo(settings):
    return Initializer([FIXTURE], settings).model


def expected_demo_probability(mission=8760.0, maintenance=False):
    """Hand-computed exact P(cooling-failed) for the demo plant."""
    q_valve = 1 - math.exp(-1e-6 * mission)
    q_pump = 0.004
    beta = 0.1
    qi = (1 - beta) * q_pump
    qc = beta * q_pump
    p_a = 1 - (1 - qi) * (1 - q_valve) if not maintenance else 1.0
    p_b = 1 - (1 - qi) * (1 - q_valve)
    return qc + (1 - qc) * p_a * p_b


class TestProbability:
    def test_exact_bdd_with_ccf(self):
        settings = (Settings().probability_analysis(True)
                    .ccf_analysis(True))
        model = load_demo(settings)
        report = RiskAnalysis(model, settings).run()
        base = [r for r in report.fault_trees if r.alignment is None]
        assert len(base) == 1
        assert abs(base[0].probability - expected_demo_probability()) < 1e-12
        assert base[0].method == "bdd/direct-propagation"

    def test_alignment_phases(self):
        settings = (Settings().probability_analysis(True)
                    .ccf_analysis(True))
        model = load_demo(settings)
        report = RiskAnalysis(model, settings).run()
        phases = {r.phase: r for r in report.fault_trees
                  if r.alignment == "operations"}
        assert set(phases) == {"at-power", "maintenance"}
        assert abs(phases["at-power"].probability -
                   expected_demo_probability(8760.0 * 0.9)) < 1e-12
        assert abs(phases["maintenance"].probability -
                   expected_demo_probability(8760.0 * 0.1, maintenance=True)
                   ) < 1e-12

    def test_rare_event_approximation(self):
        settings = (Settings().algorithm("mocus")
                    .probability_analysis(True).ccf_analysis(True))
        model = load_demo(settings)
        report = RiskAnalysis(model, settings).run()
        base = [r for r in report.fault_trees if r.alignment is None][0]
        exact = expected_demo_probability()
        assert base.probability >= exact - 1e-12   # Upper bound.
        assert abs(base.probability - exact) < 1e-4
        assert base.n_products > 0

    def test_monte_carlo(self):
        settings = (Settings().approximation("monte-carlo")
                    .probability_analysis(True).ccf_analysis(True)
                    .num_trials(200000).seed(13))
        model = load_demo(settings)
        report = RiskAnalysis(model, settings).run()
        base = [r for r in report.fault_trees if r.alignment is None][0]
        exact = expected_demo_probability()
        assert abs(base.probability - exact) < 5 * base.mc_std_error + 1e-4


class TestImportanceUncertainty:
    def test_importance_table(self):
        settings = (Settings().importance_analysis(True)
                    .ccf_analysis(True))
        model = load_demo(settings)
        report = RiskAnalysis(model, settings).run()
        base = [r for r in report.fault_trees if r.alignment is None][0]
        table = {row["event"]: row for row in base.importance}
        ccf_common = "[pump-a pump-b]"
        assert ccf_common in table
        # The common-cause event dominates risk achievement.
        assert table[ccf_common]["RAW"] > 100
        for row in table.values():
            assert row["MIF"] >= -1e-12
            assert row["RRW"] >= 1.0 - 1e-12

    def test_uncertainty(self):
        settings = (Settings().uncertainty_analysis(True)
                    .ccf_analysis(True).num_trials(2000).seed(7))
        model = load_demo(settings)
        report = RiskAnalysis(model, settings).run()
        base = [r for r in report.fault_trees if r.alignment is None][0]
        unc = base.uncertainty
        assert unc is not None
        # The mean over lognormal Q samples should be near the point value.
        assert abs(unc["mean"] - expected_demo_probability()) \
            < 0.5 * expected_demo_probability()
        assert unc["ci95"][0] < unc["mean"] < unc["ci95"][1]


class TestSil:
    def test_sil_time_sweep(self):
        settings = (Settings().time_step(876.0)
                    .safety_integrity_levels(True).ccf_analysis(True))
        model = load_demo(settings)
        report = RiskAnalysis(model, settings).run()
        base = [r for r in report.fault_trees if r.alignment is None][0]
        assert base.sil is not None
        assert len(base.time_curve) == 10
        # The curve is nondecreasing in mission time for this model.
        values = [v for _, v in base.time_curve]
        assert all(b >= a - 1e-15 for a, b in zip(values, values[1:]))
        assert base.sil["sil_level"] >= 1


class TestEventTrees:
    def test_sequences_sum_to_one(self):
        settings = Settings().probability_analysis(True).ccf_analysis(True)
        model = load_demo(settings)
        report = RiskAnalysis(model, settings).run()
        assert len(report.sequences) == 2
        by_name = {s.sequence: s for s in report.sequences}
        assert set(by_name) == {"OK", "CoreDamage"}
        total = sum(s.probability for s in report.sequences)
        assert abs(total - 1.0) < 1e-9
        assert abs(by_name["CoreDamage"].probability -
                   expected_demo_probability()) < 1e-9
        assert by_name["CoreDamage"].states == {"Cooling": "failure"}


class TestReport:
    def test_json_round_trip(self):
        settings = (Settings().importance_analysis(True)
                    .uncertainty_analysis(True).num_trials(100)
                    .ccf_analysis(True))
        model = load_demo(settings)
        report = RiskAnalysis(model, settings).run()
        payload = json.loads(report.to_json())
        assert payload["model"] == "demo-plant"
        assert payload["settings"]["ccf_analysis"] is True
        assert payload["fault_trees"]
        assert "total" in payload["timings"]


class TestUncertaintyWithApproximation:
    def test_rare_event_uncertainty_path(self):
        """With mocus/rare-event, uncertainty propagates per trial
        through the cut-set SpMM (not the exact engine)."""
        settings = (Settings().algorithm("mocus")
                    .uncertainty_analysis(True).ccf_analysis(True)
                    .num_trials(400).seed(5))
        model = load_demo(settings)
        report = RiskAnalysis(model, settings).run()
        base = [r for r in report.fault_trees if r.alignment is None][0]
        unc = base.uncertainty
        assert unc is not None
        # Rare-event is an upper bound, so the sampled mean should sit
        # at or slightly above the exact point value.
        exact = expected_demo_probability()
        assert unc["mean"] > exact * 0.5
        assert base.method == "mocus/rare_event"


class TestSequenceUncertainty:
    def test_sequences_carry_uncertainty(self):
        settings = (Settings().uncertainty_analysis(True)
                    .ccf_analysis(True).num_trials(1024).seed(11))
        model = load_demo(settings)
        report = RiskAnalysis(model, settings).run()
        by_name = {s.sequence: s for s in report.sequences}
        cd = by_name["CoreDamage"]
        assert cd.uncertainty is not None
        unc = cd.uncertainty
        assert unc["n_trials"] == 1024
        # Sampled mean tracks the point estimate (lognormal EF spread).
        assert abs(unc["mean"] - cd.probability) < 0.5 * cd.probability
        assert unc["ci95"][0] <= unc["mean"] <= unc["ci95"][1]
        assert unc["std"] > 0.0
        # Complementary sequence: trial-wise 1 - CoreDamage.
        ok = by_name["OK"]
        assert ok.uncertainty is not None
        assert abs(ok.uncertainty["mean"] + unc["mean"] - 1.0) < 1e-6

    def test_deterministic_per_seed(self):
        settings = (Settings().uncertainty_analysis(True)
                    .ccf_analysis(True).num_trials(256).seed(3))
        model = load_demo(settings)
        a = RiskAnalysis(model, settings).run()
        model2 = load_demo(settings)
        b = RiskAnalysis(model2, settings).run()
        ua = [s.uncertainty for s in a.sequences]
        ub = [s.uncertainty for s in b.sequences]
        assert ua == ub

    def test_report_schema_with_sequence_uncertainty(self):
        import os
        import canopy_tpu.schemas as schemas
        from canopy_tpu.report import report_to_xml
        from canopy_tpu.io.xml import Document, Validator

        settings = (Settings().uncertainty_analysis(True)
                    .ccf_analysis(True).num_trials(128).seed(5))
        model = load_demo(settings)
        report = RiskAnalysis(model, settings).run()
        xml = report_to_xml(report)
        assert b"<uncertainty " in xml
        schema = os.path.join(os.path.dirname(schemas.__file__),
                              "report.rng")
        Validator(schema).validate(Document.from_string(xml.decode()))


class TestBatchedPhases:
    """Alignment phases as one batched pass (VERDICT r4 item 4)."""

    def _model_with_many_phases(self, n_phases=12):
        from canopy_tpu.mef.alignment import Alignment, Phase
        from canopy_tpu.mef.element import Table
        from canopy_tpu.mef.instruction import SetHouseEvent
        settings = Settings().probability_analysis(True).ccf_analysis(True)
        model = load_demo(settings)
        model.alignments = Table("alignment")
        al = Alignment("sweep")
        for i in range(n_phases):
            ph = Phase(f"p{i}", 1.0 / n_phases)
            if i % 3 == 0 and model.house_events:
                inst = SetHouseEvent(
                    next(iter(model.house_events)).name, bool(i % 2))
                ph.instructions.append(inst)
            al.add(ph)
        model.alignments.add(al)
        return model, settings

    def test_batched_matches_per_phase_loop(self):
        import canopy_tpu.engine.analysis as amod
        model, settings = self._model_with_many_phases(12)
        fast = RiskAnalysis(model, settings).run()
        # Force the per-phase loop by disabling eligibility (prime
        # implicants excluded from the fast path).
        orig = amod.RiskAnalysis._analyze_phases_batched
        try:
            def boom(self, *a, **k):
                raise AssertionError("fast path fired")
            amod.RiskAnalysis._analyze_phases_batched = boom
            # Re-run with eligibility off via importance (any per-phase
            # derived analysis keeps the loop).
            s2 = (Settings().probability_analysis(True)
                  .ccf_analysis(True).importance_analysis(True))
            model2, _ = self._model_with_many_phases(12)
            slow = RiskAnalysis(model2, s2).run()
        finally:
            amod.RiskAnalysis._analyze_phases_batched = orig
        fa = {(r.alignment, r.phase): r for r in fast.fault_trees
              if r.alignment}
        sl = {(r.alignment, r.phase): r for r in slow.fault_trees
              if r.alignment}
        assert set(fa) == set(sl) and len(fa) == 12
        for key in fa:
            assert fa[key].probability == pytest.approx(
                sl[key].probability, rel=1e-12, abs=1e-300)
            assert fa[key].n_products == sl[key].n_products

    def test_batched_is_one_pass(self):
        """The fast path must not re-run the whole analysis per phase:
        compile/bdd timings appear once, phases as a single entry, and
        wall time stays far below 12x the root analysis."""
        model, settings = self._model_with_many_phases(12)
        ra = RiskAnalysis(model, settings)
        report = ra.run()
        t = report.timings
        top_id = [r.top_event for r in report.fault_trees][0]
        # One compile, one phases entry; no per-phase compile entries.
        assert sum(1 for k in t if k.startswith("compile:")) == 1
        assert any(k.startswith("phases:") for k in t)
        n_phase_results = sum(1 for r in report.fault_trees if r.alignment)
        assert n_phase_results == 12
        root_cost = (t[f"compile:{top_id}"]
                     + t.get(f"bdd:{top_id}", 0.0)
                     + t.get(f"products:{top_id}", 0.0)
                     + t.get(f"probability:{top_id}", 0.0))
        # 12 phases, 2 distinct house configs: far below 12 re-runs.
        assert t[f"phases:{top_id}"] < 6 * root_cost + 2.0
