"""Pallas kernel correctness vs the plain-XLA oracle (interpret mode on the
CPU test mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sc2bench_tpu.ops.pallas_kernels import (gdn_pallas, gdn_reference,
                                             has_pallas)


@pytest.mark.parametrize('inverse', [False, True])
@pytest.mark.parametrize('shape,c', [((2, 13, 17, 96), 96),
                                     ((1, 8, 8, 24), 24),
                                     ((1, 5, 5, 128), 128)])
def test_gdn_pallas_matches_reference(inverse, shape, c):
    if not has_pallas():
        pytest.skip('pallas unavailable')
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 2, shape), jnp.float32)
    gamma = jnp.asarray(rng.uniform(0, 0.2, (c, c)), jnp.float32)
    beta = jnp.asarray(rng.uniform(0.5, 1.5, (c,)), jnp.float32)
    ref = gdn_reference(x, gamma, beta, inverse)
    got = gdn_pallas(x, gamma, beta, inverse=inverse, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
