import jax
import jax.numpy as jnp
import numpy as np

from prometheus_tpu.utils import (
    matrix_to_quaternion,
    quaternion_multiply,
    quaternion_normalize,
    quaternion_slerp,
    quaternion_to_matrix,
)


def random_quats(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_matrix_roundtrip(rng):
    q = random_quats(rng, 64)
    m = quaternion_to_matrix(jnp.asarray(q))
    q2 = matrix_to_quaternion(m)
    # quaternion double cover: q and -q encode the same rotation
    dots = np.abs(np.sum(np.asarray(q2) * q, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_quat_to_matrix_is_rotation(rng):
    q = random_quats(rng, 32)
    m = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", m, m)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)


def test_identity_quat():
    m = quaternion_to_matrix(jnp.asarray([1.0, 0, 0, 0]))
    np.testing.assert_allclose(np.asarray(m), np.eye(3), atol=1e-6)


def test_known_rotation_z90():
    # 90 deg about z: q = (cos45, 0, 0, sin45)
    s = np.sin(np.pi / 4)
    q = jnp.asarray([np.cos(np.pi / 4), 0.0, 0.0, s])
    m = np.asarray(quaternion_to_matrix(q))
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(m, expected, atol=1e-6)


def test_quaternion_multiply_matches_matrix(rng):
    qa, qb = random_quats(rng, 8), random_quats(rng, 8)
    qc = quaternion_multiply(jnp.asarray(qa), jnp.asarray(qb))
    mc = np.asarray(quaternion_to_matrix(qc))
    ma = np.asarray(quaternion_to_matrix(jnp.asarray(qa)))
    mb = np.asarray(quaternion_to_matrix(jnp.asarray(qb)))
    np.testing.assert_allclose(mc, ma @ mb, atol=1e-5)


def test_slerp_endpoints_and_midpoint(rng):
    qa, qb = random_quats(rng, 8), random_quats(rng, 8)
    a, b = jnp.asarray(qa), jnp.asarray(qb)
    q0 = np.asarray(quaternion_slerp(a, b, jnp.zeros((8, 1))))
    q1 = np.asarray(quaternion_slerp(a, b, jnp.ones((8, 1))))
    np.testing.assert_allclose(np.abs(np.sum(q0 * qa, -1)), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.abs(np.sum(q1 * qb, -1)), 1.0, atol=1e-4)
    # midpoint is equidistant (in angle) from both endpoints
    qm = quaternion_slerp(a, b, jnp.full((8, 1), 0.5))
    da = np.abs(np.sum(np.asarray(qm) * qa, -1))
    db = np.abs(np.sum(np.asarray(qm) * qb, -1))
    np.testing.assert_allclose(da, db, atol=1e-4)


def test_slerp_identical_quats_stable(rng):
    q = random_quats(rng, 4)
    out = quaternion_slerp(jnp.asarray(q), jnp.asarray(q), jnp.full((4, 1), 0.3))
    np.testing.assert_allclose(np.abs(np.sum(np.asarray(out) * q, -1)), 1.0, atol=1e-5)


def test_matrix_to_quaternion_all_pivot_branches():
    # rotations by pi about each axis hit the non-trace pivots
    for axis in range(3):
        v = np.zeros(4, np.float32)
        v[axis + 1] = 1.0  # pure quaternion (0, e_axis) = pi rotation
        m = quaternion_to_matrix(jnp.asarray(v))
        q = np.asarray(matrix_to_quaternion(m))
        assert abs(abs(np.dot(q, v)) - 1.0) < 1e-5


def test_jit_and_vmap():
    q = quaternion_normalize(jnp.asarray([[2.0, 0, 0, 0], [0, 3.0, 0, 0]]))
    f = jax.jit(jax.vmap(quaternion_to_matrix))
    m = f(q)
    assert m.shape == (2, 3, 3)
