"""Closed-form tiny-inverse tests vs numpy."""

import numpy as np
import pytest

from motcpp_tpu.ops.linalg import inv2, inv3, inv4, inv5, solve_spd


def _spd(rng, b, n):
    A = rng.random((b, n, n)).astype(np.float32)
    return A @ A.transpose(0, 2, 1) + n * np.eye(n, dtype=np.float32)


@pytest.mark.parametrize("n", [2, 3, 4, 5])
def test_inverse_matches_numpy(rng, n):
    import jax.numpy as jnp

    M = _spd(rng, 16, n)
    fn = {2: lambda x: inv2(x)[0], 3: inv3, 4: inv4, 5: inv5}[n]
    got = np.asarray(fn(jnp.asarray(M)))
    want = np.linalg.inv(M)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("n", [2, 4, 5])
def test_solve_spd(rng, n):
    import jax.numpy as jnp

    M = _spd(rng, 8, n)
    B = rng.random((8, n, 3)).astype(np.float32)
    got = np.asarray(solve_spd(jnp.asarray(M), jnp.asarray(B)))
    want = np.linalg.solve(M, B)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("shape", [(4, 7, 4, 9), (2, 9, 5, 5), (8, 3, 2, 3)])
def test_matmul_small_matches_dense(rng, shape):
    """The FMA-unrolled tiny matmul must equal dense @ (the KF hot path
    relies on it for every covariance update)."""
    import jax.numpy as jnp

    from motcpp_tpu.ops.linalg import matmul_small

    b, m, n, p = shape
    A = rng.random((b, m, n)).astype(np.float32)
    B = rng.random((b, n, p)).astype(np.float32)
    got = np.asarray(matmul_small(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_allclose(got, A @ B, rtol=1e-5, atol=1e-5)


def test_matmul_small_large_contraction_falls_back(rng):
    import jax.numpy as jnp

    from motcpp_tpu.ops.linalg import matmul_small

    A = rng.random((2, 4, 16)).astype(np.float32)
    B = rng.random((2, 16, 4)).astype(np.float32)
    got = np.asarray(matmul_small(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_allclose(got, A @ B, rtol=1e-5, atol=1e-5)


def test_inv2_det(rng):
    import jax.numpy as jnp

    M = _spd(rng, 4, 2)
    _, det = inv2(jnp.asarray(M))
    np.testing.assert_allclose(np.asarray(det), np.linalg.det(M), rtol=1e-4)
