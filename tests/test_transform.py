"""Tests mirroring the reference's transform tests
(cartographer/transform/rigid_transform_test.cc, transform_test.cc)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dliom_tpu.transform import (
    Rigid3,
    quat_angle,
    quat_from_axis_angle,
    quat_from_rotation_matrix,
    quat_from_two_vectors,
    quat_from_yaw,
    quat_multiply,
    quat_normalize,
    quat_remove_yaw,
    quat_rotate,
    quat_slerp,
    quat_to_axis_angle,
    quat_to_rotation_matrix,
    quat_yaw,
    TransformInterpolationBuffer,
)


def random_quat(rng, n=()):
    q = rng.normal(size=n + (4,)).astype(np.float32)
    return np.asarray(quat_normalize(jnp.asarray(q)))


def test_quat_multiply_matches_matrix_product():
    rng = np.random.default_rng(0)
    a, b = random_quat(rng), random_quat(rng)
    m = quat_to_rotation_matrix(quat_multiply(jnp.asarray(a), jnp.asarray(b)))
    ma = quat_to_rotation_matrix(jnp.asarray(a))
    mb = quat_to_rotation_matrix(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(m), np.asarray(ma @ mb), atol=1e-5)


def test_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    q = jnp.asarray(random_quat(rng, (5,)))
    v = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    out = quat_rotate(q, v)
    m = quat_to_rotation_matrix(q)
    np.testing.assert_allclose(
        np.asarray(out), np.einsum("nij,nj->ni", np.asarray(m), np.asarray(v)), atol=1e-5
    )


def test_axis_angle_roundtrip():
    rng = np.random.default_rng(2)
    aa = rng.normal(size=(32, 3)).astype(np.float32)
    aa[0] = 0.0  # degenerate zero rotation
    aa[1] = [1e-8, 0, 0]  # tiny
    q = quat_from_axis_angle(jnp.asarray(aa))
    back = quat_to_axis_angle(q)
    np.testing.assert_allclose(np.asarray(back), aa, atol=1e-4)


def test_rotation_matrix_roundtrip():
    rng = np.random.default_rng(3)
    q = jnp.asarray(random_quat(rng, (64,)))
    back = quat_from_rotation_matrix(quat_to_rotation_matrix(q))
    # q and -q are the same rotation
    dot = np.abs(np.sum(np.asarray(q) * np.asarray(back), axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_compose_inverse_identity():
    rng = np.random.default_rng(4)
    t = Rigid3(
        jnp.asarray(random_quat(rng, (8,))),
        jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32)),
    )
    ident = t.compose(t.inverse())
    np.testing.assert_allclose(np.asarray(ident.translation), 0.0, atol=1e-5)
    np.testing.assert_allclose(
        np.abs(np.asarray(ident.rotation[..., 0])), 1.0, atol=1e-5
    )


def test_apply_compose_consistency():
    rng = np.random.default_rng(5)
    a = Rigid3(
        jnp.asarray(random_quat(rng)), jnp.asarray(rng.normal(size=3).astype(np.float32))
    )
    b = Rigid3(
        jnp.asarray(random_quat(rng)), jnp.asarray(rng.normal(size=3).astype(np.float32))
    )
    p = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(a.compose(b).apply(p)), np.asarray(a.apply(b.apply(p))), atol=1e-5
    )


def test_yaw_helpers():
    yaw = jnp.asarray([0.3, -1.2, 2.9], jnp.float32)
    q = quat_from_yaw(yaw)
    np.testing.assert_allclose(np.asarray(quat_yaw(q)), np.asarray(yaw), atol=1e-5)
    # remove_yaw leaves zero yaw
    rng = np.random.default_rng(6)
    qr = jnp.asarray(random_quat(rng, (4,)))
    np.testing.assert_allclose(np.asarray(quat_yaw(quat_remove_yaw(qr))), 0.0, atol=1e-5)


def test_slerp_endpoints_and_midpoint():
    a = quat_from_yaw(jnp.float32(0.0))
    b = quat_from_yaw(jnp.float32(1.0))
    np.testing.assert_allclose(
        np.asarray(quat_slerp(a, b, jnp.float32(0.0))), np.asarray(a), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(quat_slerp(a, b, jnp.float32(1.0))), np.asarray(b), atol=1e-6
    )
    mid = quat_slerp(a, b, jnp.float32(0.5))
    np.testing.assert_allclose(float(quat_yaw(mid)), 0.5, atol=1e-5)


def test_from_two_vectors():
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    q = quat_from_two_vectors(a, b)
    rotated = quat_rotate(q, a / jnp.linalg.norm(a, axis=-1, keepdims=True))
    np.testing.assert_allclose(
        np.asarray(rotated),
        np.asarray(b / jnp.linalg.norm(b, axis=-1, keepdims=True)),
        atol=1e-4,
    )
    # antiparallel case
    q2 = quat_from_two_vectors(
        jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray([0.0, 0.0, -1.0])
    )
    out = quat_rotate(q2, jnp.asarray([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(out), [0.0, 0.0, -1.0], atol=1e-5)


def test_quat_angle():
    aa = jnp.asarray([[0.5, 0, 0], [0, 0, 0], [0, 2.0, 0]], jnp.float32)
    q = quat_from_axis_angle(aa)
    np.testing.assert_allclose(np.asarray(quat_angle(q)), [0.5, 0.0, 2.0], atol=1e-5)


def test_vmap_and_jit_compose():
    rng = np.random.default_rng(8)
    t = Rigid3(
        jnp.asarray(random_quat(rng, (16,))),
        jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32)),
    )
    f = jax.jit(lambda x: x.compose(x.inverse()))
    out = f(t)
    np.testing.assert_allclose(np.asarray(out.translation), 0.0, atol=1e-5)


def test_interpolation_buffer():
    buf = TransformInterpolationBuffer()
    buf.push(0.0, Rigid3.translation_only(jnp.asarray([0.0, 0.0, 0.0])))
    buf.push(1.0, Rigid3.translation_only(jnp.asarray([2.0, 0.0, 0.0])))
    assert buf.has(0.5)
    mid = buf.lookup(0.5)
    np.testing.assert_allclose(np.asarray(mid.translation), [1.0, 0.0, 0.0], atol=1e-6)
    with pytest.raises(KeyError):
        buf.lookup(2.0)
    buf2 = TransformInterpolationBuffer(buffer_size_limit=2)
    for i in range(5):
        buf2.push(float(i), Rigid3.identity())
    assert len(buf2) == 2 and buf2.earliest_time == 3.0
