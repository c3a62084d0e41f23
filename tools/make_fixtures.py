#!/usr/bin/env python
"""Generate Aralia-class benchmark fixtures (MEF XML + golden values).

The reference's de-facto test corpus is the Aralia fault-tree suite
(SURVEY.md §4), which is not shipped in the snapshot; these synthesized
models have the same shape (tens of gates incl. vote gates, shared basic
events, realistic probability magnitudes). Golden top-event probabilities
are computed with the exact BDD engine and cross-checked against
Monte-Carlo estimates at generation time, then frozen as regression
anchors (tests/fixtures/golden.json).

Run from the repo root:  python tools/make_fixtures.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from canopy_tpu.compiler.bdd import build_bdd  # noqa: E402
from canopy_tpu.compiler.graph import compile_gates  # noqa: E402
from canopy_tpu.engine.bdd_eval import bdd_probability  # noqa: E402
from canopy_tpu.engine.propagate import mean_basic_probabilities  # noqa: E402
from canopy_tpu.mef.event import (Arg, BasicEvent, Connective,  # noqa: E402
                                  CONNECTIVE_NAMES, Formula, Gate)
from canopy_tpu.ops.bitpack import packed_top_probability  # noqa: E402
from canopy_tpu.utils.synthetic import synthetic_mef_tree  # noqa: E402

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "fixtures")


def emit_xml(name: str, top: Gate, events: list[BasicEvent]) -> str:
    """Serialize a gate DAG to MEF XML."""
    lines = ['<?xml version="1.0"?>',
             f'<opsa-mef name="{name}">',
             f'  <define-fault-tree name="{name}">']

    gates: list[Gate] = []
    seen = set()

    def collect(gate: Gate):
        if id(gate) in seen:
            return
        seen.add(id(gate))
        for arg in gate.formula.args:
            if isinstance(arg.event, Gate):
                collect(arg.event)
        gates.append(gate)

    collect(top)

    def arg_xml(arg: Arg) -> str:
        kind = "gate" if isinstance(arg.event, Gate) else "basic-event"
        inner = f'<{kind} name="{arg.event.name}"/>'
        return f"<not>{inner}</not>" if arg.complement else inner

    for gate in reversed(gates):
        formula = gate.formula
        conn = CONNECTIVE_NAMES[formula.connective]
        attrs = ""
        if formula.connective is Connective.ATLEAST:
            attrs = f' min="{formula.min_number}"'
        body = "".join(arg_xml(a) for a in formula.args)
        if formula.connective is Connective.NULL:
            inner = body
        else:
            inner = f"<{conn}{attrs}>{body}</{conn}>"
        lines.append(f'    <define-gate name="{gate.name}">{inner}'
                     f'</define-gate>')
    for event in events:
        lines.append(
            f'    <define-basic-event name="{event.name}">'
            f'<float value="{event.expression.value():.12g}"/>'
            f'</define-basic-event>')
    lines.append("  </define-fault-tree>")
    lines.append("</opsa-mef>")
    return "\n".join(lines) + "\n"


def main() -> None:
    golden = {}
    configs = [
        ("aralia_like_small", dict(n_basic=40, n_gates=30, fanin=3,
                                   seed=101, atleast_fraction=0.15)),
        ("aralia_like_medium", dict(n_basic=120, n_gates=90, fanin=4,
                                    seed=202, atleast_fraction=0.1)),
    ]
    for name, kw in configs:
        top, events = synthetic_mef_tree(**kw)
        tree = compile_gates([top])
        tree.top_index = tree.gate_index[top.id]
        p = jnp.asarray(mean_basic_probabilities(tree))
        bdd = build_bdd(tree)
        exact = float(bdd_probability(bdd, p))
        # Cross-check with bit-packed Monte Carlo.
        mc = float(packed_top_probability(
            tree, jax.random.PRNGKey(0), p, 32 * 65536))
        stderr = float(np.sqrt(exact * (1 - exact) / (32 * 65536)))
        assert abs(mc - exact) < max(6 * stderr, 1e-6), (name, exact, mc)

        xml = emit_xml(name, top, events)
        with open(os.path.join(FIXTURES, f"{name}.xml"), "w") as fh:
            fh.write(xml)
        golden[name] = {
            "top_event": top.id,
            "exact_probability": exact,
            "mc_estimate": mc,
            "n_basic": tree.n_basic,
            "n_gates": tree.n_gates,
            "nnz": tree.nnz,
            "bdd_nodes": bdd.n_nodes,
        }
        print(f"{name}: P={exact:.8e} (MC {mc:.4e}) "
              f"gates={tree.n_gates} bdd={bdd.n_nodes}")

    with open(os.path.join(FIXTURES, "golden.json"), "w") as fh:
        json.dump(golden, fh, indent=2)


if __name__ == "__main__":
    main()
