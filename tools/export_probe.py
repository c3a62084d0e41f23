"""Probe: can jax.export round-trip a Pallas-bearing jit on axon?

If a deserialized export executes correctly in a fresh process, bench
sections can cache serialized executables and skip host re-tracing
(the warm-run bottleneck: minutes of tracing per adjoint section).

Run 1: builds, checks, serializes to /root/repo/.jax_cache/export_probe.bin
Run 2 (fresh process): deserializes, runs, times.
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

PATH = "/root/repo/.jax_cache/export_probe.bin"


def build():
    from canopy_tpu.compiler.replay import build_replay_schedule
    from canopy_tpu.ops.stream_kernel import (replay_propagate_staged,
                                              stage_replay)
    from canopy_tpu.utils.synthetic import synthetic_compiled_tree
    tree = synthetic_compiled_tree(n_basic=512, n_gates=4096, fanin=4,
                                   n_levels=10, seed=0)
    program = build_replay_schedule(tree, max_ops_per_segment=1024)
    house = np.zeros(0, np.float32)
    rng = np.random.default_rng(0)
    basic = jnp.asarray(rng.uniform(0, 0.05, (1024, tree.n_basic)),
                        jnp.float32)
    brs = jax.jit(lambda p: stage_replay(program, p))(basic)

    @jax.jit
    def repeat(b, n_iter):
        def body(i, carry):
            acc, b = carry
            b = jax.lax.dynamic_update_index_in_dim(
                b, b[0] * (1.0 + 1e-9), 0, axis=0)
            v = replay_propagate_staged(program, b, house)
            return (acc + v.sum(), b)
        acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                   (jnp.asarray(0.0, jnp.float32), b))
        return acc

    return repeat, brs


def main():
    if os.path.exists(PATH) and "--fresh" not in sys.argv:
        t0 = time.perf_counter()
        with open(PATH, "rb") as fh:
            exp = jax.export.deserialize(fh.read())
        t1 = time.perf_counter()
        # Rebuild only the INPUT (cheap), not the traced fn.
        _repeat, brs = build()
        t2 = time.perf_counter()
        v = float(exp.call(brs, 3)[0] if isinstance(exp.call(brs, 3),
                                                    tuple)
                  else exp.call(brs, 3))
        t3 = time.perf_counter()
        print(f"deserialize {t1-t0:.2f}s, input build {t2-t1:.1f}s, "
              f"first call (compile via cache) {t3-t2:.1f}s, "
              f"value={v:.6e}")
        return
    repeat, brs = build()
    t0 = time.perf_counter()
    v = float(repeat(brs, 3))
    t1 = time.perf_counter()
    exp = jax.export.export(repeat)(brs, 3)
    blob = exp.serialize()
    os.makedirs(os.path.dirname(PATH), exist_ok=True)
    with open(PATH, "wb") as fh:
        fh.write(blob)
    t2 = time.perf_counter()
    print(f"trace+compile+run {t1-t0:.1f}s value={v:.6e}; "
          f"export+serialize {t2-t1:.1f}s ({len(blob)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
