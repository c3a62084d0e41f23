"""Extern FFI end-to-end: compile a C library, load through MEF XML."""

import os
import shutil
import subprocess

import pytest

from canopy_tpu.settings import Settings
from helpers import build_model

HAVE_CC = shutil.which("cc") or shutil.which("gcc") or shutil.which("g++")

SOURCE = """
double failure_probability(double lambda_, double hours) {
    /* 1 - exp(-lambda*t), computed the dumb way for testing. */
    double p = lambda_ * hours;
    return p < 1.0 ? p : 1.0;
}
int threshold(int value) { return value > 10 ? 1 : 0; }
"""


@pytest.fixture(scope="module")
def extern_lib(tmp_path_factory):
    if not HAVE_CC:
        pytest.skip("no C compiler")
    tmp = tmp_path_factory.mktemp("extern")
    src = tmp / "risk.c"
    src.write_text(SOURCE)
    lib = tmp / "librisk.so"
    cc = shutil.which("cc") or shutil.which("gcc") or shutil.which("g++")
    subprocess.run([cc, "-shared", "-fPIC", str(src), "-o", str(lib)],
                   check=True)
    return str(lib)


class TestExternEndToEnd:
    def test_extern_expression(self, extern_lib):
        xml = f"""<?xml version="1.0"?>
<opsa-mef>
  <define-extern-library name="risk" path="{extern_lib}" system="true"/>
  <define-extern-function name="fp" symbol="failure_probability"
                          library="risk">
    <double/><double/><double/>
  </define-extern-function>
  <define-fault-tree name="FT">
    <define-gate name="top"><basic-event name="e"/></define-gate>
    <define-basic-event name="e">
      <extern-function name="fp">
        <float value="1e-5"/><float value="100"/>
      </extern-function>
    </define-basic-event>
  </define-fault-tree>
</opsa-mef>"""
        model = build_model(xml, Settings().probability_analysis(True),
                            allow_extern=True)
        assert abs(model.basic_events.get("e").p() - 1e-3) < 1e-12

    def test_wrong_arity_rejected(self, extern_lib):
        from canopy_tpu.errors import ValidityError
        xml = f"""<?xml version="1.0"?>
<opsa-mef>
  <define-extern-library name="risk" path="{extern_lib}" system="true"/>
  <define-extern-function name="fp" symbol="failure_probability"
                          library="risk">
    <double/><double/><double/>
  </define-extern-function>
  <define-fault-tree name="FT">
    <define-gate name="top"><basic-event name="e"/></define-gate>
    <define-basic-event name="e">
      <extern-function name="fp"><float value="1e-5"/></extern-function>
    </define-basic-event>
  </define-fault-tree>
</opsa-mef>"""
        with pytest.raises(ValidityError):
            build_model(xml, Settings().probability_analysis(True),
                        allow_extern=True)

    def test_missing_symbol(self, extern_lib):
        from canopy_tpu.errors import DLError
        xml = f"""<?xml version="1.0"?>
<opsa-mef>
  <define-extern-library name="risk" path="{extern_lib}" system="true"/>
  <define-extern-function name="nope" symbol="no_such_symbol"
                          library="risk">
    <double/>
  </define-extern-function>
</opsa-mef>"""
        with pytest.raises(DLError):
            build_model(xml, Settings(), allow_extern=True)
