"""Integration golden test: the station-blackout fixture end to end."""

import math
import os

import pytest

from canopy_tpu.engine.analysis import RiskAnalysis
from canopy_tpu.mef import Initializer
from canopy_tpu.settings import Settings

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "station_blackout.xml")


def expected_ep_failed():
    """Hand computation: 2/3 vote over MGL-expanded diesels, no crosstie.

    MGL (n=3, beta=0.1, gamma=0.3, Q=0.02):
      Q1 = (1-beta) Q                      (independent)
      Q2 = (1/C(2,1)) beta (1-gamma) Q     (each specific pair)
      Q3 = beta gamma Q                    (all three)
    2-of-3 failure probability over the expanded structure: each diesel
    fails if its independent event, any of its two pair events, or the
    triple event fires.
    """
    q = 0.02
    q1 = 0.9 * q
    q2 = 0.5 * 0.1 * 0.7 * q
    q3 = 0.1 * 0.3 * q
    # Enumerate over the 7 expanded basic events:
    # independents A,B,C; pairs AB,AC,BC; triple T.
    import itertools
    probs = {"A": q1, "B": q1, "C": q1, "AB": q2, "AC": q2, "BC": q2,
             "T": q3}
    total = 0.0
    names = list(probs)
    for states in itertools.product([0, 1], repeat=len(names)):
        s = dict(zip(names, states))
        a = s["A"] or s["AB"] or s["AC"] or s["T"]
        b = s["B"] or s["AB"] or s["BC"] or s["T"]
        c = s["C"] or s["AC"] or s["BC"] or s["T"]
        if a + b + c >= 2:
            weight = 1.0
            for name, state in s.items():
                weight *= probs[name] if state else 1 - probs[name]
            total += weight
    return total


@pytest.fixture(scope="module")
def report():
    settings = (Settings().probability_analysis(True).ccf_analysis(True)
                .importance_analysis(True))
    model = Initializer([FIXTURE], settings).model
    return RiskAnalysis(model, settings).run()


class TestStationBlackout:
    def test_exact_probability(self, report):
        base = [r for r in report.fault_trees if r.alignment is None][0]
        assert abs(base.probability - expected_ep_failed()) < 1e-12

    def test_sequences(self, report):
        by_name = {s.sequence: s for s in report.sequences}
        assert set(by_name) == {"SafeShutdown", "RecoveredLate", "Blackout"}
        p_fail = expected_ep_failed()
        assert abs(by_name["SafeShutdown"].probability
                   - (1 - p_fail)) < 1e-9
        # Recovery path: P(ep-failed) * collect-expression 0.9 (rule).
        assert abs(by_name["RecoveredLate"].probability
                   - p_fail * 0.9) < 1e-9
        assert abs(by_name["Blackout"].probability - p_fail * 0.1) < 1e-9
        assert by_name["Blackout"].states == {
            "EmergencyPower": "failed", "Recovery": "not-recovered"}

    def test_house_event_gates_everything(self):
        settings = Settings().probability_analysis(True).ccf_analysis(True)
        model = Initializer([FIXTURE], settings).model
        model.house_events.get("crosstie-available").state = True
        report = RiskAnalysis(model, settings).run()
        base = [r for r in report.fault_trees if r.alignment is None][0]
        assert base.probability == 0.0

    def test_ccf_importance_ranking(self, report):
        base = [r for r in report.fault_trees if r.alignment is None][0]
        table = {row["event"]: row for row in base.importance}
        # The triple CCF event single-handedly fails 2/3 -> higher MIF
        # than any single independent diesel failure.
        triple = table["[dg-a dg-b dg-c]"]
        single = table["[dg-a]"]
        assert triple["MIF"] > single["MIF"]
