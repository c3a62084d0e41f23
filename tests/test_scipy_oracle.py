"""Kernel results vs scipy.sparse oracles (SURVEY.md §4.3)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from canopy_tpu.compiler.cutsets import CutSetGenerator
from canopy_tpu.compiler.graph import compile_gates
from canopy_tpu.engine.cutset_quantify import (build_cutset_matrix,
                                               product_probabilities)
from canopy_tpu.ops.bsr_propagate import compile_bsr
from canopy_tpu.utils.synthetic import synthetic_mef_tree


@pytest.fixture(scope="module")
def model():
    top, events = synthetic_mef_tree(n_basic=40, n_gates=30, fanin=3,
                                     seed=77, atleast_fraction=0.1,
                                     complement_fraction=0.0)
    tree = compile_gates([top])
    tree.top_index = tree.gate_index[top.id]
    products = CutSetGenerator(tree, limit_order=8).generate(top)
    return tree, products


class TestCutsetVsScipy:
    def test_log_space_spmv_matches(self, model):
        """Q_k = exp(C @ log p) where C is the scipy CSR cut-set matrix."""
        tree, products = model
        matrix = build_cutset_matrix(products, tree.n_basic)
        rng = np.random.default_rng(0)
        p = rng.uniform(0.05, 0.5, tree.n_basic)

        # scipy oracle: signed CSR; +1 columns contribute log(p),
        # -1 columns log(1-p).
        rows, cols, data = [], [], []
        cursor = 0
        for i in range(matrix.n_products):
            for k in range(matrix.indptr[i], matrix.indptr[i + 1]):
                rows.append(i)
                cols.append(matrix.indices[k])
                data.append(float(matrix.signs[k]))
        C = sp.csr_matrix((data, (rows, cols)),
                          shape=(matrix.n_products, tree.n_basic))
        pos = C.maximum(0)
        neg = (-C).maximum(0)
        log_q = pos @ np.log(p) + neg @ np.log1p(-p)
        expected = np.exp(log_q)

        got = np.asarray(product_probabilities(matrix, jnp.asarray(p)))
        np.testing.assert_allclose(got, expected, rtol=1e-12)

    def test_batched_spmm_matches(self, model):
        tree, products = model
        matrix = build_cutset_matrix(products, tree.n_basic)
        rng = np.random.default_rng(1)
        batch = rng.uniform(0.01, 0.6, (32, tree.n_basic))
        got = np.asarray(product_probabilities(matrix, jnp.asarray(batch)))
        # Dense oracle per trial.
        for t in range(0, 32, 7):
            expected_t = np.ones(matrix.n_products)
            for i in range(matrix.n_products):
                for k in range(matrix.indptr[i], matrix.indptr[i + 1]):
                    col = matrix.indices[k]
                    v = batch[t, col]
                    expected_t[i] *= (1 - v) if matrix.signs[k] < 0 else v
            np.testing.assert_allclose(got[t], expected_t, rtol=1e-12)


class TestBsrVsScipy:
    def test_structure_matches_scipy_bsr(self):
        """The BSR tiles reproduce scipy's bsr_matrix blocking."""
        from canopy_tpu.utils.synthetic import synthetic_compiled_tree
        tree = synthetic_compiled_tree(n_basic=256, n_gates=512, fanin=4,
                                       n_levels=4, seed=9, locality=64)
        program = compile_bsr(tree)
        for level, lv in zip(program.levels, tree.levels):
            # Rebuild the level structure matrix densely from blocks.
            block = lv.prods[0]
            G = level.n_gates
            from canopy_tpu.ops.bsr_propagate import _BLOCK, _ROW_BLOCK
            dense = np.zeros((level.n_row_blocks * _ROW_BLOCK,
                              2 * program.n_pad))
            for p_i in range(len(level.pair_rows)):
                r0 = level.pair_rows[p_i] * _ROW_BLOCK
                c0 = level.pair_cols[p_i] * _BLOCK
                dense[r0:r0 + _ROW_BLOCK, c0:c0 + _BLOCK] += \
                    level.blocks[p_i]
            # Oracle: direct edge accumulation.
            oracle = np.zeros_like(dense)
            for blk in lv.prods:
                for g in range(blk.n_gates):
                    row = int(blk.out_idx[g]) - level.out_start
                    for f in range(blk.arg_idx.shape[1]):
                        if not blk.arg_mask[g, f]:
                            continue
                        col = int(blk.arg_idx[g, f])
                        if blk.arg_flip[g, f]:
                            col += program.n_pad
                        oracle[row, col] += 1.0
            np.testing.assert_array_equal(dense, oracle)
            # And scipy's bsr conversion agrees on the block pattern.
            bsr = sp.bsr_matrix(sp.csr_matrix(oracle),
                                blocksize=(_ROW_BLOCK, _BLOCK))
            assert bsr.data.shape[0] == len(level.pair_rows)
