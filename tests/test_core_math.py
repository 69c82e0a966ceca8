"""Unit tests for the core math layer (SH, camera math, transforms, losses,
schedules, sparse codes) against independent NumPy computations."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langsplatv2_tpu.utils import (
    sh as sh_mod,
    camera_math as cm,
    transforms as tf,
    losses,
    schedules,
    sparse_codes as sc,
)


class TestSH:
    def test_deg0_is_constant(self, rng):
        shs = rng.normal(size=(5, 3, 16)).astype(np.float32)
        dirs = rng.normal(size=(5, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        out = sh_mod.eval_sh(0, jnp.asarray(shs), jnp.asarray(dirs))
        np.testing.assert_allclose(out, sh_mod.C0 * shs[..., 0], rtol=1e-6)

    def test_deg1_linear(self, rng):
        # With only the z-linear coefficient set, result = C0*sh0 + C1*z*sh2.
        shs = np.zeros((1, 1, 4), np.float32)
        shs[..., 0] = 2.0
        shs[..., 2] = 1.0
        d = np.array([[0.0, 0.0, 1.0]], np.float32)
        out = sh_mod.eval_sh(1, jnp.asarray(shs), jnp.asarray(d))
        np.testing.assert_allclose(
            out, [[sh_mod.C0 * 2.0 + sh_mod.C1]], rtol=1e-6
        )

    @pytest.mark.parametrize("deg", [0, 1, 2, 3, 4])
    def test_parseval_partial(self, deg, rng):
        """SH basis orthonormality: integrating |basis|^2 over the sphere by
        Monte-Carlo should approximate 1/(4*pi) * (deg+1)^2 sum over coeffs."""
        n = 200000
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        ncoef = (deg + 1) ** 2
        # Evaluate each basis function by setting one coefficient at a time.
        vals = []
        for i in range(ncoef):
            shs = np.zeros((1, 1, ncoef), np.float32)
            shs[..., i] = 1.0
            out = np.asarray(
                sh_mod.eval_sh(deg, jnp.asarray(np.broadcast_to(shs, (n, 1, ncoef))), jnp.asarray(v))
            )
            vals.append(out[:, 0])
        vals = np.stack(vals, 1)  # [n, ncoef]
        gram = vals.T @ vals / n  # expect I / (4 pi)
        np.testing.assert_allclose(gram, np.eye(ncoef) / (4 * np.pi), atol=6e-3)

    def test_rgb_sh_roundtrip(self, rng):
        rgb = rng.uniform(size=(7, 3)).astype(np.float32)
        back = sh_mod.sh_to_rgb(sh_mod.rgb_to_sh(jnp.asarray(rgb)))
        np.testing.assert_allclose(back, rgb, rtol=1e-6)


class TestCameraMath:
    def test_world_to_view_inverse(self, rng):
        # Random rotation via QR.
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        t = rng.normal(size=3)
        Rt = cm.get_world_to_view(q, t)
        # Columns/rows: world point at camera center maps to origin.
        C2W = np.linalg.inv(Rt)
        center = C2W[:3, 3]
        p = Rt @ np.append(center, 1.0)
        np.testing.assert_allclose(p[:3], 0.0, atol=1e-5)

    def test_projection_matrix_znear_zfar(self):
        znear, zfar = 0.01, 100.0
        fovx = fovy = math.radians(60)
        P = cm.get_projection_matrix(znear, zfar, fovx, fovy)
        # Row-vector convention: clip = [x,y,z,1] @ P.T ... we use x @ P^T
        # conventions at call sites; here verify column-vector action P @ p.
        p_near = P @ np.array([0, 0, znear, 1.0])
        p_far = P @ np.array([0, 0, zfar, 1.0])
        assert abs(p_near[2] / p_near[3]) < 1e-6  # z_ndc(znear) == 0
        assert abs(p_far[2] / p_far[3] - 1.0) < 1e-6  # z_ndc(zfar) == 1

    def test_fov_focal_roundtrip(self):
        fov = math.radians(70)
        focal = cm.fov_to_focal(fov, 1920)
        assert abs(cm.focal_to_fov(focal, 1920) - fov) < 1e-12

    def test_ndc_to_pixel(self):
        assert cm.ndc_to_pixel(-1.0, 100) == -0.5
        assert cm.ndc_to_pixel(1.0, 100) == 99.5


class TestTransforms:
    def test_quat_identity(self):
        R = tf.quat_to_rotmat(jnp.array([[1.0, 0, 0, 0]]))
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-7)

    def test_quat_orthonormal(self, rng):
        q = rng.normal(size=(10, 4)).astype(np.float32)
        R = np.asarray(tf.quat_to_rotmat(jnp.asarray(q)))
        for i in range(10):
            np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
            assert np.linalg.det(R[i]) > 0.99

    def test_quat_90deg_z(self):
        # 90 degrees about z: (w,x,y,z) = (cos45, 0, 0, sin45)
        s = math.sqrt(0.5)
        R = np.asarray(tf.quat_to_rotmat(jnp.array([[s, 0, 0, s]])))[0]
        np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)

    def test_covariance_psd_and_eigvals(self, rng):
        s = rng.uniform(0.5, 2.0, size=(5, 3)).astype(np.float32)
        q = rng.normal(size=(5, 4)).astype(np.float32)
        c6 = tf.covariance_from_scaling_rotation(jnp.asarray(s), 1.0, jnp.asarray(q))
        cov = np.asarray(tf.unstrip_symmetric(c6))
        for i in range(5):
            eig = np.sort(np.linalg.eigvalsh(cov[i]))
            np.testing.assert_allclose(eig, np.sort(s[i] ** 2), rtol=1e-4, atol=1e-5)

    def test_inverse_sigmoid(self):
        x = jnp.array([0.1, 0.5, 0.9])
        np.testing.assert_allclose(
            tf.jax_sigmoid(tf.inverse_sigmoid(x)), x, rtol=1e-5
        )


class TestLosses:
    def test_l1_l2(self, rng):
        a = rng.normal(size=(3, 8, 8)).astype(np.float32)
        b = rng.normal(size=(3, 8, 8)).astype(np.float32)
        np.testing.assert_allclose(losses.l1_loss(a, b), np.abs(a - b).mean(), rtol=1e-6)
        np.testing.assert_allclose(losses.l2_loss(a, b), ((a - b) ** 2).mean(), rtol=1e-6)

    def test_cos_loss_identical_and_orthogonal(self):
        a = jnp.ones((4, 2, 2))
        assert float(losses.cos_loss(a, a)) < 1e-6
        b = jnp.stack([jnp.ones((2, 2)), -jnp.ones((2, 2)), jnp.zeros((2, 2)), jnp.zeros((2, 2))])
        c = jnp.stack([jnp.zeros((2, 2)), jnp.zeros((2, 2)), jnp.ones((2, 2)), -jnp.ones((2, 2))])
        np.testing.assert_allclose(float(losses.cos_loss(b, c)), 1.0, atol=1e-6)

    def test_ssim_self_is_one(self, rng):
        img = rng.uniform(size=(3, 32, 32)).astype(np.float32)
        val = losses.ssim(jnp.asarray(img), jnp.asarray(img))
        np.testing.assert_allclose(float(val), 1.0, atol=1e-5)

    def test_ssim_decreases_with_noise(self, rng):
        img = rng.uniform(size=(3, 32, 32)).astype(np.float32)
        noisy = img + 0.2 * rng.normal(size=img.shape).astype(np.float32)
        v1 = float(losses.ssim(jnp.asarray(img), jnp.asarray(noisy)))
        assert 0.0 < v1 < 0.95

    def test_psnr(self, rng):
        img = rng.uniform(size=(1, 3, 8, 8)).astype(np.float32)
        noisy = np.clip(img + 0.1, 0, 1)
        p = np.asarray(losses.psnr(jnp.asarray(noisy), jnp.asarray(img)))
        expected = 20 * np.log10(1.0 / np.sqrt(((noisy - img) ** 2).mean()))
        np.testing.assert_allclose(p[0, 0], expected, rtol=1e-4)


class TestSchedules:
    def test_endpoints(self):
        f = schedules.expon_lr_func(1e-2, 1e-4, max_steps=100)
        np.testing.assert_allclose(float(f(0)), 1e-2, rtol=1e-5)
        np.testing.assert_allclose(float(f(100)), 1e-4, rtol=1e-5)
        # Geometric midpoint at half-way.
        np.testing.assert_allclose(float(f(50)), 1e-3, rtol=1e-4)

    def test_negative_step_disabled(self):
        f = schedules.expon_lr_func(1e-2, 1e-4, max_steps=100)
        assert float(f(-1)) == 0.0

    def test_delay(self):
        f = schedules.expon_lr_func(1e-2, 1e-2, lr_delay_steps=10, lr_delay_mult=0.1, max_steps=100)
        np.testing.assert_allclose(float(f(0)), 1e-3, rtol=1e-5)
        np.testing.assert_allclose(float(f(10)), 1e-2, rtol=1e-5)


class TestSparseCodes:
    def test_topk_soft_code_properties(self, rng):
        logits = jnp.asarray(rng.normal(size=(50, 64)).astype(np.float32))
        code = np.asarray(sc.softmax_to_topk_soft_code(logits, 4))
        assert ((code > 0).sum(axis=1) <= 4).all()
        np.testing.assert_allclose(code.sum(axis=1), 1.0, atol=1e-5)
        # Kept entries are exactly the top-4 of the softmax, renormalized.
        soft = np.asarray(jax.nn.softmax(logits, axis=1))
        for i in range(50):
            top4 = np.sort(np.argsort(soft[i])[-4:])
            np.testing.assert_array_equal(np.sort(np.nonzero(code[i])[0]), top4)
            np.testing.assert_allclose(
                code[i, top4], soft[i, top4] / (soft[i, top4].sum() + 1e-10), rtol=1e-5
            )

    def test_weights_and_indices_match_dense(self, rng):
        logits = jnp.asarray(rng.normal(size=(20, 64)).astype(np.float32))
        dense = np.asarray(sc.softmax_to_topk_soft_code(logits, 4))
        w, idx = sc.get_weights_and_indices(logits, 4)
        w, idx = np.asarray(w), np.asarray(idx).astype(int)
        for i in range(20):
            # Indices ascend (reference traversal order) and weights match the
            # dense representation at those indices.
            assert (np.diff(idx[i]) > 0).all()
            np.testing.assert_allclose(w[i], dense[i, idx[i]], atol=1e-6)

    def test_kmeans_recovers_clusters(self):
        key = jax.random.PRNGKey(0)
        centers_true = jnp.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 10.0]])
        pts = jnp.concatenate(
            [centers_true[i] + 0.1 * jax.random.normal(jax.random.PRNGKey(i), (500, 2)) for i in range(3)]
        )
        centers = sc.minibatch_kmeans(key, pts, 3, iters=100, batch_size=256)
        centers = np.asarray(centers)
        # Each true center should be close to some learned center.
        for c in np.asarray(centers_true):
            d = np.linalg.norm(centers - c, axis=1).min()
            assert d < 0.5, (c, centers)

    def test_residual_codebooks_shape(self, rng):
        feats = jnp.asarray(rng.normal(size=(2000, 16)).astype(np.float32))
        books = sc.residual_kmeans_codebooks(jax.random.PRNGKey(0), feats, 2, 8, iters=20, batch_size=512)
        assert books.shape == (2, 8, 16)
        # Residual levels should have smaller norm than the first level.
        assert float(jnp.linalg.norm(books[1])) < float(jnp.linalg.norm(books[0]))
