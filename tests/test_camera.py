"""Camera model tests against OpenCV oracles and autodiff Jacobians."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_byzyh_tpu.ops import camera

EUROC_PINHOLE = np.array([458.654, 457.296, 367.215, 248.375], np.float32)
EUROC_DIST = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05], np.float32)
# TUM-VI 512 fisheye calibration ballpark.
TUMVI_KB8 = np.array(
    [190.97847, 190.9733, 254.93170, 256.89742,
     0.0034823894, 0.0007150348, -0.0020532361, 0.00020293673], np.float32)


def random_cam_points(rng, n=256, fov_limit=0.8):
    """Points in front of the camera within a cone."""
    z = rng.uniform(0.5, 10.0, size=n)
    x = rng.uniform(-fov_limit, fov_limit, size=n) * z
    y = rng.uniform(-fov_limit, fov_limit, size=n) * z
    return np.stack([x, y, z], axis=-1).astype(np.float32)


class TestPinhole:
    def test_project_unproject_roundtrip(self, rng):
        pc = random_cam_points(rng)
        uv = camera.pinhole_project(jnp.asarray(EUROC_PINHOLE), jnp.asarray(pc))
        ray = camera.pinhole_unproject(jnp.asarray(EUROC_PINHOLE), uv)
        np.testing.assert_allclose(
            np.asarray(ray), pc / pc[:, 2:3], atol=1e-4)

    def test_project_jac_matches_autodiff(self, rng):
        pc = random_cam_points(rng, n=32)
        params = jnp.asarray(EUROC_PINHOLE)
        J = np.asarray(camera.pinhole_project_jac(params, jnp.asarray(pc)))
        J_ad = np.asarray(jax.vmap(jax.jacfwd(
            lambda p: camera.pinhole_project(params, p)))(jnp.asarray(pc)))
        np.testing.assert_allclose(J, J_ad, rtol=1e-4, atol=1e-4)

    def test_distort_matches_opencv(self, rng):
        pc = random_cam_points(rng, n=64, fov_limit=0.5)
        xy = pc[:, :2] / pc[:, 2:3]
        ours = np.asarray(camera.radtan_distort(jnp.asarray(EUROC_DIST), jnp.asarray(xy)))
        K = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1.0]])
        cv_pts, _ = cv2.projectPoints(
            np.concatenate([xy, np.ones((64, 1))], -1).astype(np.float64),
            np.zeros(3), np.zeros(3), K, EUROC_DIST.astype(np.float64))
        np.testing.assert_allclose(ours, cv_pts[:, 0, :], atol=1e-4)

    def test_undistort_matches_opencv(self, rng):
        # Sample raw pixels over the EuRoC 752x480 sensor.
        uv = np.stack([
            rng.uniform(30, 720, size=128), rng.uniform(30, 450, size=128)
        ], axis=-1).astype(np.float32)
        ours = np.asarray(camera.undistort_pixels(
            jnp.asarray(EUROC_PINHOLE), jnp.asarray(EUROC_DIST), jnp.asarray(uv), iters=20))
        fx, fy, cx, cy = EUROC_PINHOLE
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)
        cv_out = cv2.undistortPoints(
            uv.reshape(-1, 1, 2).astype(np.float64), K,
            EUROC_DIST.astype(np.float64), P=K).reshape(-1, 2)
        # OpenCV's own iteration terminates early at image corners; our 20-iter
        # fixed point is distort-roundtrip-exact to <1e-4 px, so allow 0.5 px.
        np.testing.assert_allclose(ours, cv_out, atol=0.5)

    def test_undistort_roundtrip_exact(self, rng):
        uv = np.stack([
            rng.uniform(30, 720, size=128), rng.uniform(30, 450, size=128)
        ], axis=-1).astype(np.float32)
        params, dist = jnp.asarray(EUROC_PINHOLE), jnp.asarray(EUROC_DIST)
        und = camera.undistort_pixels(params, dist, jnp.asarray(uv), iters=20)
        fx, fy, cx, cy = EUROC_PINHOLE
        xy = jnp.stack([(und[..., 0] - cx) / fx, (und[..., 1] - cy) / fy], -1)
        back = np.asarray(camera.radtan_distort(dist, xy))
        back_px = np.stack([back[:, 0] * fx + cx, back[:, 1] * fy + cy], -1)
        np.testing.assert_allclose(back_px, uv, atol=1e-3)


class TestKB8:
    def test_project_matches_opencv_fisheye(self, rng):
        pc = random_cam_points(rng, n=64, fov_limit=1.2)
        ours = np.asarray(camera.kb8_project(jnp.asarray(TUMVI_KB8), jnp.asarray(pc)))
        fx, fy, cx, cy = TUMVI_KB8[:4]
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)
        D = TUMVI_KB8[4:].astype(np.float64)
        cv_out, _ = cv2.fisheye.projectPoints(
            pc[:, None, :].astype(np.float64), np.zeros(3), np.zeros(3), K, D)
        np.testing.assert_allclose(ours, cv_out[:, 0, :], atol=1e-3)

    def test_unproject_roundtrip(self, rng):
        pc = random_cam_points(rng, n=128, fov_limit=1.2)
        params = jnp.asarray(TUMVI_KB8)
        uv = camera.kb8_project(params, jnp.asarray(pc))
        ray = np.asarray(camera.kb8_unproject(params, uv))
        np.testing.assert_allclose(ray, pc / pc[:, 2:3], atol=2e-4)

    def test_project_jac_matches_autodiff(self, rng):
        pc = random_cam_points(rng, n=32, fov_limit=1.0)
        params = jnp.asarray(TUMVI_KB8)
        J = np.asarray(camera.kb8_project_jac(params, jnp.asarray(pc)))
        J_ad = np.asarray(jax.vmap(jax.jacfwd(
            lambda p: camera.kb8_project(params, p)))(jnp.asarray(pc)))
        np.testing.assert_allclose(J, J_ad, rtol=2e-3, atol=2e-3)

    def test_wide_angle_points(self, rng):
        """Fisheye must handle >90deg off-axis points (z can be ~0)."""
        n = 32
        theta = rng.uniform(0.3, 1.45, size=n)  # up to ~83 deg
        psi = rng.uniform(0, 2 * np.pi, size=n)
        d = rng.uniform(1.0, 5.0, size=n)
        pc = np.stack([
            d * np.sin(theta) * np.cos(psi),
            d * np.sin(theta) * np.sin(psi),
            d * np.cos(theta)], -1).astype(np.float32)
        params = jnp.asarray(TUMVI_KB8)
        uv = camera.kb8_project(params, jnp.asarray(pc))
        ray = np.asarray(camera.kb8_unproject(params, uv))
        np.testing.assert_allclose(ray, pc / pc[:, 2:3], rtol=1e-3, atol=1e-3)
