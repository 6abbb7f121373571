import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sfm_tpu.geometry import (
    rodrigues_matrix,
    rodrigues_vector,
    rotate_points,
    projection_matrix,
    project_pinhole,
    project_cam,
    pack_cam,
    triangulate_dlt,
    ray_plane_intersection,
    eight_point,
    sampson_distance,
    epipolar_distance,
)
from sfm_tpu.geometry.triangulation import backproject_pixel


def random_rotation(rng, n=()):
    import scipy.spatial.transform as st

    q = rng.normal(size=(*n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return st.Rotation.from_quat(q.reshape(-1, 4)).as_matrix().reshape(*n, 3, 3)


class TestRotations:
    def test_matrix_roundtrip(self, rng):
        R = random_rotation(rng, (64,))
        rv = rodrigues_vector(jnp.asarray(R))
        R2 = rodrigues_matrix(rv)
        assert np.allclose(R2, R, atol=1e-5)

    def test_rotate_matches_matrix(self, rng):
        rv = rng.normal(size=(32, 3)).astype(np.float32)
        pts = rng.normal(size=(32, 3)).astype(np.float32)
        out = rotate_points(jnp.asarray(pts), jnp.asarray(rv))
        R = rodrigues_matrix(jnp.asarray(rv))
        expect = np.einsum("nij,nj->ni", np.asarray(R), pts)
        assert np.allclose(out, expect, atol=1e-5)

    def test_zero_angle(self):
        pts = jnp.asarray([[1.0, 2.0, 3.0]])
        rv = jnp.zeros((1, 3))
        assert np.allclose(rotate_points(pts, rv), pts, atol=1e-6)
        assert np.allclose(rodrigues_matrix(rv), np.eye(3), atol=1e-6)

    def test_matches_cv2(self, rng):
        cv2 = pytest.importorskip("cv2")
        for _ in range(10):
            rv = rng.normal(size=3)
            R_cv, _ = cv2.Rodrigues(rv)
            R = rodrigues_matrix(jnp.asarray(rv))
            assert np.allclose(R, R_cv, atol=1e-5)

    def test_near_pi(self, rng):
        axis = rng.normal(size=(8, 3))
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        rv = axis * (np.pi - 1e-5)
        R = rodrigues_matrix(jnp.asarray(rv))
        rv2 = rodrigues_vector(R)
        R2 = rodrigues_matrix(rv2)
        assert np.allclose(R2, R, atol=1e-4)

    def test_grad_finite_at_small_angle(self):
        def loss(rv):
            return jnp.sum(rotate_points(jnp.ones((3,)), rv) ** 2)

        g = jax.grad(loss)(jnp.full((3,), 1e-8))
        assert np.all(np.isfinite(g))


class TestProjection:
    def test_projection_matrix(self, dino_calib):
        P = projection_matrix(
            jnp.asarray(dino_calib.K),
            jnp.asarray(dino_calib.R),
            jnp.asarray(dino_calib.t),
        )
        assert np.allclose(P, dino_calib.P, atol=1e-6)

    def test_pinhole_matches_cv2(self, rng, dino_calib):
        cv2 = pytest.importorskip("cv2")
        pts = rng.normal(size=(50, 3)) * 0.05
        K, R, t = dino_calib.K[3], dino_calib.R[3], dino_calib.t[3]
        rv, _ = cv2.Rodrigues(R)
        expect, _ = cv2.projectPoints(pts, rv, t, K, None)
        got = project_pinhole(
            jnp.asarray(pts), jnp.asarray(K), jnp.asarray(R), jnp.asarray(t)
        )
        assert np.allclose(got, expect.reshape(-1, 2), atol=1e-3)

    def test_cam_matches_pinhole_no_distortion(self, rng, dino_calib):
        # With k1=k2=0 the 12-param model == pinhole with the true fx, fy.
        K = dino_calib.K[0].copy()
        K[0, 1] = 0.0
        R, t = dino_calib.R[0], dino_calib.t[0]
        rv = rodrigues_vector(jnp.asarray(R)[None])[0]
        cam = pack_cam(jnp.asarray(K), rv, jnp.asarray(t))
        pts = rng.normal(size=(40, 3)) * 0.05
        got = project_cam(jnp.asarray(pts), cam[None, :])
        expect = project_pinhole(
            jnp.asarray(pts), jnp.asarray(K), jnp.asarray(R), jnp.asarray(t)
        )
        assert np.allclose(got, expect, atol=1e-3)

    def test_radial_distortion_direction(self):
        # Positive k1 pushes points outward from principal point.
        cam = jnp.asarray(
            [[0.0, 0, 0, 0, 0, 1.0, 100.0, 100.0, 0.1, 0.0, 0.0, 0.0]]
        )
        pt = jnp.asarray([[0.5, 0.0, 1.0]])
        undist = project_cam(pt, cam.at[:, 8].set(0.0))
        dist = project_cam(pt, cam)
        assert dist[0, 0] > undist[0, 0] > 0


class TestTriangulation:
    def _synthetic_views(self, rng, n_pts=64, n_views=3):
        import scipy.spatial.transform as st

        pts = rng.normal(size=(n_pts, 3)) * 0.1 + np.array([0, 0, 2.0])
        K = np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]])
        Ps, pixs = [], []
        for v in range(n_views):
            ang = (v - 1) * 0.3
            R = st.Rotation.from_euler("y", ang).as_matrix()
            C = np.array([np.sin(ang) * -2.0, 0, 2.0 - 2.0 * np.cos(ang)])
            t = -R @ C
            P = K @ np.concatenate([R, t[:, None]], axis=1)
            h = (P @ np.concatenate([pts, np.ones((n_pts, 1))], 1).T).T
            pix = h[:, :2] / h[:, 2:3]
            Ps.append(P)
            pixs.append(pix)
        return pts, np.stack(Ps), np.stack(pixs, axis=0)

    def test_two_view(self, rng):
        pts, Ps, pixs = self._synthetic_views(rng, n_views=2)
        P = jnp.asarray(np.broadcast_to(Ps, (pts.shape[0], 2, 3, 4)))
        pix = jnp.asarray(np.transpose(pixs, (1, 0, 2)))
        X, w = triangulate_dlt(P, pix)
        assert np.allclose(X, pts, atol=1e-3)
        assert np.all(np.abs(w) > 1e-8)

    def test_multi_view_masked(self, rng):
        pts, Ps, pixs = self._synthetic_views(rng, n_views=3)
        n = pts.shape[0]
        P = jnp.asarray(np.broadcast_to(Ps, (n, 3, 3, 4)))
        pix = np.transpose(pixs, (1, 0, 2)).copy()
        # Corrupt the third view but mask it out.
        pix[:, 2] += 500.0
        mask = jnp.asarray(np.broadcast_to([1.0, 1.0, 0.0], (n, 3)))
        X, _ = triangulate_dlt(P, jnp.asarray(pix), mask)
        assert np.allclose(X, pts, atol=1e-3)

    def test_matches_cv2(self, rng):
        cv2 = pytest.importorskip("cv2")
        pts, Ps, pixs = self._synthetic_views(rng, n_views=2)
        X_cv = cv2.triangulatePoints(Ps[0], Ps[1], pixs[0].T, pixs[1].T)
        X_cv = (X_cv[:3] / X_cv[3]).T
        n = pts.shape[0]
        P = jnp.asarray(np.broadcast_to(Ps, (n, 2, 3, 4)))
        pix = jnp.asarray(np.transpose(pixs, (1, 0, 2)))
        X, _ = triangulate_dlt(P, pix)
        assert np.allclose(X, X_cv, atol=1e-3)

    def test_ray_plane(self):
        o = jnp.asarray([0.0, 0, 0])
        d = jnp.asarray([0.0, 0, 1.0])
        p, valid = ray_plane_intersection(
            o, d, jnp.asarray([0.0, 0, 5.0]), jnp.asarray([0.0, 0, -1.0])
        )
        assert valid
        assert np.allclose(p, [0, 0, 5.0], atol=1e-6)
        # Parallel ray -> invalid.
        _, valid2 = ray_plane_intersection(
            o, jnp.asarray([1.0, 0, 0]), jnp.asarray([0.0, 0, 5.0]),
            jnp.asarray([0.0, 0, -1.0]),
        )
        assert not valid2

    def test_backproject_inverts_project(self, rng, dino_calib):
        K = jnp.asarray(dino_calib.K[5])
        R = jnp.asarray(dino_calib.R[5])
        t = jnp.asarray(dino_calib.t[5])
        pts = jnp.asarray(rng.normal(size=(20, 3)) * 0.05)
        pix = project_pinhole(pts, K, R, t)
        C, d = backproject_pixel(pix, K, R, t)
        # The world point must lie on the back-projected ray.
        to_pt = pts - C
        to_pt = to_pt / jnp.linalg.norm(to_pt, axis=-1, keepdims=True)
        dots = jnp.abs(jnp.sum(to_pt * d, axis=-1))
        assert np.allclose(dots, 1.0, atol=1e-5)


class TestEpipolar:
    def _correspondences(self, rng, n=100):
        import scipy.spatial.transform as st

        pts = rng.normal(size=(n, 3)) * 0.3 + np.array([0, 0, 3.0])
        K = np.array([[700.0, 0, 320], [0, 700.0, 240], [0, 0, 1]])
        R = st.Rotation.from_euler("yx", [0.2, 0.05]).as_matrix()
        t = np.array([0.5, 0.02, 0.1])
        P1 = K @ np.eye(3, 4)
        P2 = K @ np.concatenate([R, t[:, None]], 1)
        h1 = (P1 @ np.concatenate([pts, np.ones((n, 1))], 1).T).T
        h2 = (P2 @ np.concatenate([pts, np.ones((n, 1))], 1).T).T
        p1 = h1[:, :2] / h1[:, 2:]
        p2 = h2[:, :2] / h2[:, 2:]
        # Ground-truth F from E = [t]x R:  F = K^-T E K^-1.
        tx = np.array(
            [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]]
        )
        E = tx @ R
        F = np.linalg.inv(K).T @ E @ np.linalg.inv(K)
        F /= np.linalg.norm(F)
        return p1, p2, F

    def test_eight_point_exact(self, rng):
        p1, p2, F_true = self._correspondences(rng)
        F = np.asarray(eight_point(jnp.asarray(p1), jnp.asarray(p2)))
        # F defined up to sign.
        if np.sum(F * F_true) < 0:
            F = -F
        assert np.allclose(F, F_true, atol=1e-4)
        d = sampson_distance(jnp.asarray(F), jnp.asarray(p1), jnp.asarray(p2))
        assert float(jnp.max(d)) < 1e-4

    def test_eight_point_weighted_ignores_outliers(self, rng):
        p1, p2, F_true = self._correspondences(rng)
        p1c = p1.copy()
        p1c[:10] += 300.0  # corrupt, then mask out
        w = np.ones(len(p1c))
        w[:10] = 0.0
        F = np.asarray(
            eight_point(jnp.asarray(p1c), jnp.asarray(p2), jnp.asarray(w))
        )
        if np.sum(F * F_true) < 0:
            F = -F
        assert np.allclose(F, F_true, atol=1e-4)

    def test_distances_flag_outliers(self, rng):
        p1, p2, F_true = self._correspondences(rng)
        p2n = p2.copy()
        p2n[:5] += 30.0
        F = jnp.asarray(F_true)
        d = epipolar_distance(F, jnp.asarray(p1), jnp.asarray(p2n))
        assert float(jnp.min(d[:5])) > 1.0
        assert float(jnp.max(d[5:])) < 1e-2


class TestNullvec:
    """geometry.nullvec inverse iteration vs jnp.linalg.eigh."""

    @pytest.mark.parametrize("k", [3, 4, 9])
    def test_matches_eigh_on_separated_spectra(self, rng, k):
        from sfm_tpu.geometry.nullvec import smallest_eigvec

        B = 64
        # PSD with a well-separated smallest eigenvalue (the DLT/8-point
        # regime): lambda_min ~ 1e-6, others in [0.1, 1].
        q = rng.normal(size=(B, k, k))
        Q = np.linalg.qr(q)[0]
        lams = np.concatenate(
            [np.full((B, 1), 1e-6), rng.uniform(0.1, 1.0, (B, k - 1))], axis=1
        )
        M = np.einsum("bik,bk,bjk->bij", Q, lams, Q)
        v = np.asarray(smallest_eigvec(jnp.asarray(M)))
        _, vecs = np.linalg.eigh(M)
        ref = vecs[:, :, 0]
        dot = np.abs(np.sum(v * ref, axis=-1))
        assert np.all(dot > 1 - 1e-4), dot.min()

    def test_exact_nullspace(self, rng):
        from sfm_tpu.geometry.nullvec import smallest_eigvec

        # Rank-deficient normal matrix (minimal 8-point sample): A is 8x9.
        A = rng.normal(size=(16, 8, 9))
        M = np.einsum("bki,bkj->bij", A, A)
        v = np.asarray(smallest_eigvec(jnp.asarray(M)))
        resid = np.linalg.norm(np.einsum("bij,bj->bi", M, v), axis=-1)
        assert np.all(resid < 1e-4), resid.max()

    def test_cho_solve_roundtrip(self, rng):
        from sfm_tpu.geometry.nullvec import (
            cholesky_unrolled, cho_solve_unrolled,
        )

        A = rng.normal(size=(32, 5, 5))
        M = np.einsum("bki,bkj->bij", A, A) + 0.5 * np.eye(5)
        b = rng.normal(size=(32, 5))
        L = cholesky_unrolled(jnp.asarray(M))
        x = np.asarray(cho_solve_unrolled(L, jnp.asarray(b)))
        np.testing.assert_allclose(
            np.einsum("bij,bj->bi", M, x), b, atol=1e-3
        )
