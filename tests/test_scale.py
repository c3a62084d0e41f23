"""Benchmark-scale structural tests (config-3-class shapes, host only)."""

import numpy as np
import pytest

from canopy_tpu.utils.synthetic import synthetic_compiled_tree


class TestMillionGateCompile:
    def test_structure_builds_fast(self):
        """1M gates compile to arrays without Python-object overhead."""
        import time
        t0 = time.perf_counter()
        tree = synthetic_compiled_tree(n_basic=32768, n_gates=1_000_000,
                                       fanin=4, n_levels=16, seed=0)
        elapsed = time.perf_counter() - t0
        assert tree.n_gates == 1_000_000
        assert tree.nnz == 4_000_000
        assert tree.depth == 16
        assert elapsed < 30.0  # Array construction, not object graphs.
        # Level outputs are contiguous and non-overlapping.
        covered = 0
        for level in tree.levels:
            block = level.prods[0]
            assert (np.diff(block.out_idx) == 1).all()
            covered += block.n_gates
        assert covered == tree.n_gates

    def test_small_slice_evaluates(self):
        """A slice of the same generator propagates correctly on CPU."""
        import jax.numpy as jnp
        from canopy_tpu.engine.propagate import top_event_probability
        tree = synthetic_compiled_tree(n_basic=256, n_gates=2048, fanin=4,
                                       n_levels=8, seed=0)
        p = jnp.asarray(np.random.default_rng(0).uniform(
            0, 0.05, (4, tree.n_basic)))
        out = top_event_probability(tree, p)
        assert out.shape == (4,)
        assert np.isfinite(np.asarray(out)).all()
