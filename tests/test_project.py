"""Project-file tests."""

import json
import os
import shutil

import pytest

from canopy_tpu.cli import main
from canopy_tpu.errors import ValidityError
from canopy_tpu.project import load_project
from canopy_tpu.settings import Algorithm, Approximation

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

PROJECT = """<?xml version="1.0"?>
<canopy-project>
  <input-files>
    <file>demo_plant.xml</file>
  </input-files>
  <options>
    <algorithm value="bdd"/>
    <analysis probability="true" importance="true" ccf="true"/>
    <limits num-trials="123" seed="9" mission-time="1000"/>
  </options>
  <output file="out/report.json"/>
</canopy-project>
"""


@pytest.fixture
def project_dir(tmp_path):
    shutil.copy(os.path.join(FIXTURES, "demo_plant.xml"),
                tmp_path / "demo_plant.xml")
    (tmp_path / "project.xml").write_text(PROJECT)
    (tmp_path / "out").mkdir()
    return tmp_path


class TestProjectFile:
    def test_load(self, project_dir):
        project = load_project(str(project_dir / "project.xml"))
        assert project.input_files == [str(project_dir / "demo_plant.xml")]
        s = project.settings
        assert s.algorithm() == Algorithm.BDD
        assert s.probability_analysis() and s.importance_analysis()
        assert s.ccf_analysis()
        assert s.num_trials() == 123
        assert s.seed() == 9
        assert s.mission_time() == 1000
        assert project.output == str(project_dir / "out" / "report.json")

    def test_cli_runs_project(self, project_dir):
        code = main(["--project", str(project_dir / "project.xml"),
                     "--platform", "cpu"])
        assert code == 0
        payload = json.loads(
            (project_dir / "out" / "report.json").read_text())
        assert payload["settings"]["num_trials"] == 123
        base = [r for r in payload["fault_trees"] if "alignment" not in r]
        assert base[0]["probability"] > 0
        assert base[0]["importance"]

    def test_cli_flags_override(self, project_dir, tmp_path):
        out = tmp_path / "o.json"
        code = main(["--project", str(project_dir / "project.xml"),
                     "--num-trials", "77", "--platform", "cpu",
                     "-o", str(out)])
        assert code == 0
        payload = json.loads(out.read_text())
        assert payload["settings"]["num_trials"] == 77

    def test_bad_root(self, tmp_path):
        bad = tmp_path / "p.xml"
        bad.write_text("<not-a-project/>")
        from canopy_tpu.errors import XmlError
        with pytest.raises((ValidityError, XmlError)):
            load_project(str(bad))

    def test_no_inputs(self, tmp_path):
        bad = tmp_path / "p.xml"
        bad.write_text("<canopy-project><input-files/></canopy-project>")
        from canopy_tpu.errors import XmlError
        with pytest.raises((ValidityError, XmlError)):
            load_project(str(bad))

    def test_cli_without_inputs_errors(self, capsys):
        assert main(["--probability"]) == 2


class TestProjectSchema:
    """schemas/project.rng fills the reference's reserved project-schema
    slot (env.h:27-31): structural errors fail at validation, not in
    loader code."""

    MODEL = ("""<?xml version="1.0"?><opsa-mef name="t">"""
             """<define-fault-tree name="t"><define-gate name="top">"""
             """<or><basic-event name="e"/></or></define-gate>"""
             """<define-basic-event name="e"><float value="0.1"/>"""
             """</define-basic-event></define-fault-tree></opsa-mef>""")

    def test_valid_project_passes_schema(self, tmp_path):
        model = tmp_path / "m.xml"
        model.write_text(self.MODEL)
        path = tmp_path / "p.xml"
        path.write_text("""<?xml version="1.0"?>
<canopy-project>
  <input-files><file>m.xml</file></input-files>
  <options>
    <algorithm value="bdd"/>
    <analysis probability="true" importance="true"/>
    <limits limit-order="8" seed="3"/>
  </options>
</canopy-project>
""")
        project = load_project(str(path))
        assert project.settings.limit_order() == 8

    def test_schema_rejects_bad_algorithm(self, tmp_path):
        from canopy_tpu.errors import Error
        path = tmp_path / "p.xml"
        path.write_text("""<?xml version="1.0"?>
<canopy-project>
  <input-files><file>m.xml</file></input-files>
  <options><algorithm value="quantum"/></options>
</canopy-project>
""")
        with pytest.raises(Error):
            load_project(str(path))

    def test_schema_rejects_unknown_element(self, tmp_path):
        from canopy_tpu.errors import Error
        path = tmp_path / "p.xml"
        path.write_text("""<?xml version="1.0"?>
<canopy-project>
  <input-files><file>m.xml</file></input-files>
  <mystery/>
</canopy-project>
""")
        with pytest.raises(Error):
            load_project(str(path))
