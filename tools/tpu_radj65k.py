"""Dev experiment: replay-adjoint importance at the 65k-gate scale.

The VERDICT r4 item-3 criterion: importance on the 65k-gate uniform
thrash tree runs via the replay adjoint (sub-kernel-split backward),
grad-checked against T-chunked gather autodiff, with the speedup vs
gather autodiff measured by chained-loop differencing.

One process per run (tunnel-backend isolation).  Host tracing of the
~64+ sub-kernels is the dominant one-time cost (reported per phase);
the XLA compiles ride the persistent cache.

Usage: python tools/tpu_radj65k.py [--gates 65536] [--iters 32]
       [--max-bwd-ops 12288] [--seg 2048] [--skip-gather]
"""
import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gates", type=int, default=65536)
    ap.add_argument("--trials", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--seg", type=int, default=2048)
    ap.add_argument("--max-bwd-ops", type=int, default=12288)
    ap.add_argument("--pool", type=int, default=0,
                    help="adjoint pool slots (0 = auto); smaller pools "
                         "shrink the per-sub-kernel dump/load traffic")
    ap.add_argument("--skip-gather", action="store_true",
                    help="skip the gather-autodiff comparison loop "
                         "(grad check still runs, T-chunked)")
    args = ap.parse_args()

    from canopy_tpu.compiler.replay_adjoint import build_replay_adjoint
    from canopy_tpu.engine.propagate import top_event_probability
    from canopy_tpu.ops.replay_adjoint_kernel import \
        make_differentiable_replay
    from canopy_tpu.ops.stream_kernel import replay_grad_basic, stage_replay
    from canopy_tpu.utils.synthetic import synthetic_compiled_tree

    t0 = time.perf_counter()
    tree = synthetic_compiled_tree(n_basic=8192, n_gates=args.gates,
                                   fanin=4, n_levels=14, seed=0)
    kw = dict(max_ops_per_segment=args.seg,
              max_bwd_ops=args.max_bwd_ops)
    if args.pool:
        kw["pool_slots"] = args.pool
    aprog = build_replay_adjoint(tree, **kw)
    b = aprog.base
    n_subs = sum(len(s) for s in aprog.bwd_segments)
    print(f"schedule [{time.perf_counter()-t0:.0f}s]: "
          f"{len(b.segments)} fwd segments, {n_subs} bwd sub-kernels, "
          f"{b.n_evicted} evictions, tape_rows={aprog.tape_rows}",
          flush=True)

    house = np.zeros(0, np.float32)
    f = make_differentiable_replay(aprog, house)
    rng = np.random.default_rng(0)
    basic = jnp.asarray(
        rng.uniform(0.0, 0.05, (args.trials, tree.n_basic)), jnp.float32)
    brs = jax.jit(lambda p: stage_replay(b, p))(basic)

    @jax.jit
    def rep_s(s, n_iter):
        def body(i, carry):
            acc, s = carry
            s = jax.lax.dynamic_update_index_in_dim(
                s, s[0] * (1.0 + 1e-9), 0, axis=0)
            v, g = jax.value_and_grad(lambda x: f(x).sum())(s)
            return (acc + v + g.sum(), s)
        acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                   (jnp.asarray(0.0, jnp.float32), s))
        return acc

    t0 = time.perf_counter()
    float(rep_s(brs, 2))
    print(f"replay-adjoint trace+compile+warmup: "
          f"{time.perf_counter()-t0:.0f}s", flush=True)

    def best3(fn, x, n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(x, n))
            best = min(best, time.perf_counter() - t0)
        return best

    s_dt = (best3(rep_s, brs, 2 + args.iters)
            - best3(rep_s, brs, 2)) / args.iters
    print(f"replay-adjoint fwd+bwd: {s_dt*1e3:.3f} ms/iter", flush=True)

    # Gradient agreement vs T-chunked gather autodiff (256-trial chunks
    # keep the 65k-gate value matrix + autodiff residuals in HBM).
    t0 = time.perf_counter()
    v_s, g_s = jax.jit(jax.value_and_grad(lambda s: f(s).sum()))(brs)
    gb = np.asarray(replay_grad_basic(b, g_s, args.trials))
    chunk = 256
    gg = np.zeros_like(gb)
    v_g = 0.0
    grad_chunk = jax.jit(jax.value_and_grad(
        lambda x: top_event_probability(
            tree, x, jnp.asarray(house)).sum()))
    for lo in range(0, args.trials, chunk):
        v_c, g_c = grad_chunk(basic[lo:lo + chunk])
        v_g += float(v_c)
        gg[lo:lo + chunk] = np.asarray(g_c)
    rel = float(np.max(np.abs(gb - gg))) / max(
        float(np.max(np.abs(gg))), 1e-300)
    print(f"grad check [{time.perf_counter()-t0:.0f}s]: "
          f"max err/|g|max = {rel:.1e}, top sums "
          f"{float(v_s):.6e} vs {v_g:.6e}", flush=True)

    if not args.skip_gather:
        @jax.jit
        def rep_g(p, n_iter):
            def body(i, carry):
                acc, p = carry
                p = p.at[:, :1].mul(1.0 + 1e-9)
                v, g = jax.value_and_grad(
                    lambda y: top_event_probability(
                        tree, y, jnp.asarray(house)).sum())(p)
                return (acc + v + g.sum(), p)
            acc, _ = jax.lax.fori_loop(0, n_iter, body,
                                       (jnp.asarray(0.0, jnp.float32), p))
            return acc

        t0 = time.perf_counter()
        float(rep_g(basic, 2))
        print(f"gather-autodiff compile+warmup: "
              f"{time.perf_counter()-t0:.0f}s", flush=True)
        g_iters = max(args.iters // 4, 4)
        g_dt = (best3(rep_g, basic, 2 + g_iters)
                - best3(rep_g, basic, 2)) / g_iters
        print(f"gather autodiff fwd+bwd: {g_dt*1e3:.2f} ms/iter -> "
              f"replay adjoint is {g_dt/s_dt:.1f}x", flush=True)


if __name__ == "__main__":
    main()
