"""RELAX NG schema validation tests."""

import os

import pytest

from canopy_tpu.errors import XmlValidityError
from canopy_tpu.io.xml import Document, Validator
from canopy_tpu.schemas import default_schema_path

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


class TestSchema:
    def test_schema_compiles(self):
        Validator(default_schema_path())

    @pytest.mark.parametrize("fixture", ["demo_plant.xml",
                                         "aralia_like_small.xml",
                                         "aralia_like_medium.xml"])
    def test_fixtures_validate(self, fixture):
        validator = Validator(default_schema_path())
        Document(os.path.join(FIXTURES, fixture), validator)

    def test_invalid_rejected(self):
        validator = Validator(default_schema_path())
        with pytest.raises(XmlValidityError):
            Document.from_string(
                "<opsa-mef><define-gate name='x'/></opsa-mef>",
                validator=validator)

    def test_unknown_element_rejected(self):
        validator = Validator(default_schema_path())
        with pytest.raises(XmlValidityError):
            Document.from_string(
                "<opsa-mef><define-magic name='x'/></opsa-mef>",
                validator=validator)

    def test_cli_validate_flag(self, tmp_path):
        from canopy_tpu.cli import main
        out = tmp_path / "r.json"
        code = main([os.path.join(FIXTURES, "demo_plant.xml"),
                     "--validate", "--probability", "--ccf",
                     "-o", str(out)])
        assert code == 0
