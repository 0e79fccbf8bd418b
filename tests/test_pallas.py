"""Pallas kernel tests (interpreter mode on CPU; compiled on TPU)."""

import jax.numpy as jnp
import numpy as np

from densemonoslam_tpu.ops.pallas.gram import gram_pallas


def test_gram_pallas_matches_xla(rng):
    for P, C in [(4096, 8), (10000, 8), (307200, 8), (100, 16)]:
        M = jnp.asarray(rng.normal(0, 1, (P, C)).astype(np.float32))
        ref = np.asarray(M.T @ M)
        out = np.asarray(gram_pallas(M, interpret=True))
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-2)


def test_gram_pallas_zero_pad_invariance(rng):
    """Padding rows must not change the result (masked rows are zero)."""
    M = jnp.asarray(rng.normal(0, 1, (5000, 8)).astype(np.float32))
    out1 = np.asarray(gram_pallas(M, interpret=True))
    M2 = jnp.concatenate([M, jnp.zeros((3000, 8))], axis=0)
    out2 = np.asarray(gram_pallas(M2, interpret=True))
    np.testing.assert_allclose(out1, out2, rtol=1e-6)
