"""Dev experiment: hybrid resident-basic tier on the 400k-gate tree.

Measures, for one ``--resident N`` variant per process (a poisoned
tunnel backend does not survive RESOURCE_EXHAUSTED — CLAUDE.md):

* staged-array tiles (HBM capacity) and stage time,
* replay kernel ms/iter via chained ``fori_loop`` differencing,
* the schedule's stream/DMA composition.

Usage:  python tools/tpu_hybrid400k.py --resident 0|1024|2048
"""
import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--resident", type=int, default=0)
    ap.add_argument("--gates", type=int, default=400_000)
    ap.add_argument("--trials", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=256)
    args = ap.parse_args()

    from canopy_tpu.compiler.replay import build_replay_schedule
    from canopy_tpu.ops.stream_kernel import (replay_propagate_staged,
                                              stage_replay)
    from canopy_tpu.utils.synthetic import synthetic_compiled_tree

    sys.path.insert(0, "/root/repo")
    from bench import host_cached

    t0 = time.perf_counter()
    tree = host_cached(
        f"tree-{args.gates}g-f4",
        lambda: synthetic_compiled_tree(n_basic=8192, n_gates=args.gates,
                                        fanin=4, n_levels=14, seed=0))
    t_tree = time.perf_counter() - t0
    t0 = time.perf_counter()
    if args.resident:
        program = host_cached(
            f"replay-{args.gates}g-f4-res{args.resident}",
            lambda: build_replay_schedule(tree,
                                          resident_tiles=args.resident))
    else:
        program = host_cached(f"replay-{args.gates}g-f4",
                              lambda: build_replay_schedule(tree))
    t_sched = time.perf_counter() - t0
    print(f"schedule: res_tiles={program.res_tiles} "
          f"resident_reads={program.n_resident_reads} "
          f"brs_len_pad={program.brs_len_pad} "
          f"({program.brs_len_pad * 4096 / 1e6:.0f} MB/trial-tile) "
          f"pool={program.pool_slots} evicted={program.n_evicted} "
          f"intra={program.n_intra} inter={program.n_inter} "
          f"slab={program.n_slab_reads} segs={len(program.segments)} "
          f"[tree {t_tree:.0f}s, sched {t_sched:.0f}s]", flush=True)

    rng = np.random.default_rng(0)
    basic = jnp.asarray(
        rng.uniform(0.0, 0.05, (args.trials, tree.n_basic)), jnp.float32)
    house = np.zeros(0, np.float32)
    stage_j = jax.jit(lambda p: stage_replay(program, p))
    t0 = time.perf_counter()
    brs = stage_j(basic)
    brs.block_until_ready()
    t_stage_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    brs = stage_j(basic)
    brs.block_until_ready()
    t_stage = time.perf_counter() - t0
    print(f"stage: {brs.shape[0]} tiles = "
          f"{brs.shape[0] * 4096 / 1e9:.2f} GB, "
          f"{t_stage * 1e3:.1f} ms warm ({t_stage_cold:.1f}s cold)",
          flush=True)

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

    t0 = time.perf_counter()
    float(repeat(brs, 2))
    print(f"compile+warmup: {time.perf_counter() - t0:.0f}s", flush=True)

    def best3(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(repeat(brs, n))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (best3(2 + args.iters) - best3(2)) / args.iters
    value = program.nnz * args.trials / dt
    print(f"kernel: {dt * 1e3:.3f} ms/iter, {value / 1e9:.2f} "
          f"Gnnz*trials/s (resident={args.resident})", flush=True)


if __name__ == "__main__":
    main()
