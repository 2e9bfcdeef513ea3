"""Property tests for ops/rotations vs scipy.spatial.transform ground truth."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from uuo_mocap_tpu.ops import rotations as R

RNG = np.random.RandomState(0)


def random_rotvecs(n):
    v = RNG.randn(n, 3)
    scale = RNG.uniform(0, np.pi * 0.99, (n, 1))
    return v / np.linalg.norm(v, axis=-1, keepdims=True) * scale


@pytest.fixture(scope="module")
def rotvecs():
    aa = random_rotvecs(64)
    aa[0] = 0.0  # identity
    aa[1] = [1e-9, 0, 0]  # tiny angle
    aa[2] = [np.pi - 1e-6, 0, 0]  # near-pi
    return aa


def test_axis_angle_to_matrix_matches_scipy(rotvecs):
    ours = np.asarray(R.axis_angle_to_matrix(jnp.asarray(rotvecs)))
    ref = ScipyRot.from_rotvec(rotvecs).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_matrix_quaternion_roundtrip(rotvecs):
    mats = ScipyRot.from_rotvec(rotvecs).as_matrix()
    q = R.matrix_to_quaternion(jnp.asarray(mats))
    back = np.asarray(R.quaternion_to_matrix(q))
    np.testing.assert_allclose(back, mats, atol=1e-5)
    # scipy uses xyzw; ours is wxyz
    q_ref = ScipyRot.from_matrix(mats).as_quat()  # [x,y,z,w]
    q_ref = np.concatenate([q_ref[:, 3:], q_ref[:, :3]], axis=-1)
    q_ref *= np.where(q_ref[:, :1] < 0, -1.0, 1.0)
    np.testing.assert_allclose(np.asarray(q), q_ref, atol=1e-5)


def test_axis_angle_roundtrip(rotvecs):
    mats = R.axis_angle_to_matrix(jnp.asarray(rotvecs))
    aa = np.asarray(R.matrix_to_axis_angle(mats))
    np.testing.assert_allclose(aa, rotvecs, atol=1e-4)


def test_quaternion_axis_angle_roundtrip(rotvecs):
    q = R.axis_angle_to_quaternion(jnp.asarray(rotvecs))
    aa = np.asarray(R.quaternion_to_axis_angle(q))
    np.testing.assert_allclose(aa, rotvecs, atol=1e-5)


def test_6d_roundtrip_and_orthonormality(rotvecs):
    mats = ScipyRot.from_rotvec(rotvecs).as_matrix()
    d6 = R.matrix_to_rotation_6d(jnp.asarray(mats))
    assert d6.shape == (len(rotvecs), 6)
    back = np.asarray(R.rotation_6d_to_matrix(d6))
    np.testing.assert_allclose(back, mats, atol=1e-5)
    # noisy 6d still produces orthonormal matrices
    noisy = np.asarray(d6) + RNG.randn(*d6.shape) * 0.1
    m = np.asarray(R.rotation_6d_to_matrix(jnp.asarray(noisy)))
    eye = np.einsum("bij,bkj->bik", m, m)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)


def test_so3_relative_angle(rotvecs):
    mats = ScipyRot.from_rotvec(rotvecs).as_matrix()
    a = mats[: len(mats) // 2]
    b = mats[len(mats) // 2 :]
    ours = np.asarray(R.so3_relative_angle(jnp.asarray(a), jnp.asarray(b)))
    ref = np.array(
        [np.linalg.norm((ScipyRot.from_matrix(x) * ScipyRot.from_matrix(y).inv()).as_rotvec()) for x, y in zip(a, b)]
    )
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_slerp_endpoints_and_midpoint():
    aa0 = np.array([[0.3, -0.2, 0.9]])
    aa1 = np.array([[-0.4, 0.8, 0.1]])
    q0 = R.axis_angle_to_quaternion(jnp.asarray(aa0))
    q1 = R.axis_angle_to_quaternion(jnp.asarray(aa1))
    np.testing.assert_allclose(np.asarray(R.quaternion_slerp(q0, q1, 0.0)), np.asarray(q0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(R.quaternion_slerp(q0, q1, 1.0)), np.asarray(q1), atol=1e-6)
    mid = np.asarray(R.quaternion_slerp(q0, q1, 0.5))[0]
    # scipy slerp ground truth
    key_rots = ScipyRot.from_rotvec(np.concatenate([aa0, aa1]))
    from scipy.spatial.transform import Slerp

    ref = Slerp([0, 1], key_rots)([0.5]).as_quat()[0]  # xyzw
    ref = np.concatenate([ref[3:], ref[:3]])
    if np.dot(ref, mid) < 0:
        ref = -ref
    np.testing.assert_allclose(mid, ref, atol=1e-5)


def test_slerp_identical_quaternions():
    q = R.axis_angle_to_quaternion(jnp.asarray(np.array([[0.1, 0.2, 0.3]])))
    out = np.asarray(R.quaternion_slerp(q, q, 0.37))
    np.testing.assert_allclose(out, np.asarray(q), atol=1e-6)


def test_rot_z_rot_y():
    ang = jnp.asarray(np.array([[np.pi / 2]]))
    rz = np.asarray(R.rot_z(ang))[0]
    np.testing.assert_allclose(rz @ np.array([1, 0, 0.0]), [0, 1, 0], atol=1e-6)
    ry = np.asarray(R.rot_y(ang))[0]
    np.testing.assert_allclose(ry @ np.array([1, 0, 0.0]), [0, 0, -1], atol=1e-6)


def test_grad_through_6d():
    import jax

    def f(d6):
        return jnp.sum(R.rotation_6d_to_matrix(d6) ** 2)

    g = jax.grad(f)(jnp.asarray(RNG.randn(4, 6), dtype=jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))


def test_grad_finite_at_exactly_zero_angle():
    """Regression: sqrt(theta^2) grad at theta=0 is inf; `where` does not
    block NaN grads from the untaken branch.  Optimized yaw params start at
    exactly 0, so a NaN here poisons every solve."""
    import jax

    g = jax.grad(lambda a: jnp.sum(R.axis_angle_to_matrix(a)))(jnp.zeros((2, 3)))
    assert np.isfinite(np.asarray(g)).all()
    g = jax.grad(lambda a: jnp.sum(R.rot_z(a)))(jnp.zeros((2, 1)))
    assert np.isfinite(np.asarray(g)).all()
    g = jax.grad(lambda a: jnp.sum(R.axis_angle_to_quaternion(a)))(jnp.zeros((2, 3)))
    assert np.isfinite(np.asarray(g)).all()
    q_id = jnp.asarray(np.array([[1.0, 0, 0, 0]], np.float32))
    g = jax.grad(lambda q: jnp.sum(R.quaternion_to_axis_angle(q)))(q_id)
    assert np.isfinite(np.asarray(g)).all()


def test_grad_through_so3_relative_angle_near_identity():
    import jax

    def f(aa):
        m = R.axis_angle_to_matrix(aa)
        return jnp.sum(R.so3_relative_angle(m[1:], m[:-1]))

    aa = jnp.asarray(RNG.randn(5, 3) * 1e-3, dtype=jnp.float32)
    g = jax.grad(f)(aa)
    assert np.all(np.isfinite(np.asarray(g)))
