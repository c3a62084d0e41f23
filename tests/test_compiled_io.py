"""Compiled-model .npz round trip: arrays, house state, tape."""

import jax
import jax.numpy as jnp
import numpy as np

from canopy_tpu.compiler.expr_tape import ExpressionTape
from canopy_tpu.compiler.graph import compile_gates
from canopy_tpu.engine.propagate import top_event_probability
from canopy_tpu.io.compiled_io import load_compiled, save_compiled
from canopy_tpu.mef.event import Arg, Connective, Formula, Gate, HouseEvent
from canopy_tpu.mef.expr.random_deviate import LognormalDeviate
from canopy_tpu.mef.expr.constant import ConstantExpression
from canopy_tpu.utils.synthetic import synthetic_mef_tree


def _model_with_everything():
    top, events = synthetic_mef_tree(n_basic=48, n_gates=32, fanin=4,
                                     seed=7, atleast_fraction=0.25)
    # Add a house event and an xor gate on top.
    house = HouseEvent("maintenance", state=True)
    xor = Gate("xor-wrap")
    xor.formula = Formula(Connective.XOR, [Arg(top), Arg(house)])
    # Give one basic event an epistemic distribution for the tape.
    events[0].expression = LognormalDeviate(
        ConstantExpression(1e-3), ConstantExpression(3.0),
        ConstantExpression(0.95))
    tree = compile_gates([xor])
    tree.top_index = tree.gate_index[xor.id]
    return tree, events


def test_round_trip_propagation(tmp_path):
    tree, _ = _model_with_everything()
    path = tmp_path / "model.npz"
    save_compiled(path, tree)
    loaded, tape = load_compiled(path)
    assert tape is None
    assert loaded.top_index == tree.top_index
    assert loaded.basic_index == tree.basic_index
    assert loaded.gate_index == tree.gate_index
    np.testing.assert_array_equal(loaded.house_state_vector(),
                                  tree.house_state_vector())

    rng = np.random.default_rng(0)
    p = rng.uniform(0.0, 0.3, (16, tree.n_basic))
    ref = np.asarray(top_event_probability(
        tree, jnp.asarray(p), jnp.asarray(tree.house_state_vector())))
    got = np.asarray(top_event_probability(
        loaded, jnp.asarray(p), jnp.asarray(loaded.house_state_vector())))
    np.testing.assert_array_equal(got, ref)


def test_round_trip_tape_sampling(tmp_path):
    tree, events = _model_with_everything()
    used = [e for e in events if e.id in tree.basic_index]
    used.sort(key=lambda e: tree.basic_index[e.id])
    tape = ExpressionTape.build([e.expression for e in used])
    path = tmp_path / "model.npz"
    save_compiled(path, tree, tape=tape)
    _, tape2 = load_compiled(path)

    means1 = np.asarray(tape.evaluate_mean(8760.0))
    means2 = np.asarray(tape2.evaluate_mean(8760.0))
    np.testing.assert_array_equal(means2, means1)

    key = jax.random.key(42)
    s1 = np.asarray(tape.sample(key, 64, 8760.0))
    s2 = np.asarray(tape2.sample(key, 64, 8760.0))
    # Slot-keyed counter-based draws: bit-identical after reload.
    np.testing.assert_array_equal(s2, s1)
