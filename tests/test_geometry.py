import numpy as np
import pytest

from tacorl_tpu.utils.geometry import (
    euler_to_matrix,
    matrix_to_euler,
    quat_to_matrix,
    to_world_frame,
)

scipy_rot = pytest.importorskip("scipy.spatial.transform").Rotation


def test_euler_matrix_round_trip():
    rs = np.random.RandomState(0)
    for _ in range(20):
        e = rs.uniform(-1.2, 1.2, 3)
        m = euler_to_matrix(e)
        np.testing.assert_allclose(
            m, scipy_rot.from_euler("xyz", e).as_matrix(), atol=1e-9
        )
        np.testing.assert_allclose(matrix_to_euler(m), e, atol=1e-7)


def test_quat_to_matrix_matches_scipy():
    rs = np.random.RandomState(1)
    for _ in range(10):
        q = rs.randn(4)
        q /= np.linalg.norm(q)
        np.testing.assert_allclose(
            quat_to_matrix(q), scipy_rot.from_quat(q).as_matrix(), atol=1e-9
        )


def test_to_world_frame_identity_orientation():
    pos, orn = to_world_frame(
        np.array([0.1, 0.0, 0.0]), np.zeros(3), np.zeros(3)
    )
    np.testing.assert_allclose(pos, [0.1, 0, 0], atol=1e-12)
    np.testing.assert_allclose(orn, np.zeros(3), atol=1e-12)


def test_to_world_frame_rotated_tcp():
    # TCP rotated 90deg about z: TCP x-axis is world y-axis
    tcp_orn = np.array([0.0, 0.0, np.pi / 2])
    pos, _ = to_world_frame(np.array([0.1, 0.0, 0.0]), np.zeros(3), tcp_orn)
    np.testing.assert_allclose(pos, [0.0, 0.1, 0.0], atol=1e-9)
