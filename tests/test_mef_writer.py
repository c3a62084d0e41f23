"""Round-trip property tests: parse -> serialize -> parse preserves
quantification exactly."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from canopy_tpu.compiler.bdd import build_bdd
from canopy_tpu.compiler.graph import compile_fault_tree
from canopy_tpu.engine.analysis import RiskAnalysis
from canopy_tpu.engine.bdd_eval import bdd_probability
from canopy_tpu.engine.propagate import mean_basic_probabilities
from canopy_tpu.io.mef_writer import model_to_mef_xml
from canopy_tpu.io.xml import Document, Validator
from canopy_tpu.mef import Initializer
from canopy_tpu.schemas import default_schema_path
from canopy_tpu.settings import Settings

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

FIXTURE_FILES = ["demo_plant.xml", "station_blackout.xml",
                 "aralia_like_small.xml", "aralia_like_medium.xml"]


def load(path, settings):
    return Initializer([os.path.join(FIXTURES, path)], settings).model


@pytest.mark.parametrize("fixture", FIXTURE_FILES)
class TestRoundTrip:
    def test_serialized_model_validates(self, fixture):
        settings = Settings().probability_analysis(True)
        model = load(fixture, settings)
        xml = model_to_mef_xml(model)
        validator = Validator(default_schema_path())
        Document.from_string(xml.decode(), validator=validator)

    def test_quantification_preserved(self, fixture):
        settings = (Settings().probability_analysis(True)
                    .ccf_analysis(True))
        model = load(fixture, settings)
        xml = model_to_mef_xml(model)
        reparsed = Initializer.from_documents(
            [Document.from_string(xml.decode())], settings).model

        original = RiskAnalysis(model, settings).run()
        round_tripped = RiskAnalysis(reparsed, settings).run()

        def key(r):
            return (r.fault_tree, r.top_event, r.alignment, r.phase)

        lhs = {key(r): r.probability for r in original.fault_trees}
        rhs = {key(r): r.probability for r in round_tripped.fault_trees}
        assert lhs.keys() == rhs.keys()
        for k in lhs:
            assert lhs[k] == pytest.approx(rhs[k], abs=0, rel=1e-12), k
        lhs_seq = {s.sequence: s.probability for s in original.sequences}
        rhs_seq = {s.sequence: s.probability
                   for s in round_tripped.sequences}
        assert lhs_seq == pytest.approx(rhs_seq, rel=1e-12)
