"""topk_blockmax must be a bit-exact lax.top_k drop-in (values, indices,
tie order) at every block size and shape regime — it feeds stage-1
candidate selection, where a wrong tie means a different candidate SET
and a visible ranking change (ops.py EXACTNESS proof)."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from modern_search_engines_project_tpu.retrieval.ops import topk_blockmax


def _check(scores, k, block=None):
    want_v, want_i = lax.top_k(scores, k)
    got_v, got_i = topk_blockmax(scores, k, block)
    np.testing.assert_array_equal(np.asarray(want_v), np.asarray(got_v))
    np.testing.assert_array_equal(np.asarray(want_i), np.asarray(got_i))


class TestTopkBlockmax:
    @pytest.mark.parametrize("block", [None, 4, 8, 16])
    def test_random_scores_exact(self, block):
        rng = np.random.default_rng(3)
        scores = jnp.asarray(
            rng.standard_normal((8, 40000), dtype=np.float32)
        )
        _check(scores, 1000, block)

    @pytest.mark.parametrize("block", [4, 16])
    def test_heavy_ties_at_tau_exact(self, block):
        """Quantized scores put MANY docs exactly at the k-th value; the
        tie-quota construction must admit the same lowest-index set as
        lax.top_k."""
        rng = np.random.default_rng(7)
        scores = jnp.asarray(
            np.round(rng.standard_normal((4, 30000)) * 2).astype(np.float32)
        )
        _check(scores, 500, block)

    def test_all_equal_rows(self):
        scores = jnp.zeros((3, 20000), jnp.float32)
        _check(scores, 100)

    def test_small_n_falls_back(self):
        rng = np.random.default_rng(1)
        scores = jnp.asarray(
            rng.standard_normal((5, 800), dtype=np.float32)
        )
        _check(scores, 200)  # N <= 4*k*G: plain lax.top_k path

    def test_recursive_path(self):
        """block=4 at a width that recurses at least once."""
        rng = np.random.default_rng(9)
        scores = jnp.asarray(
            rng.standard_normal((2, 70000), dtype=np.float32)
        )
        _check(scores, 1000, 4)

    def test_neg_inf_padding_safe(self):
        rng = np.random.default_rng(5)
        s = rng.standard_normal((3, 9999)).astype(np.float32)
        s[:, -7:] = -np.inf
        _check(jnp.asarray(s), 300, 16)
