"""PointNet++ op tests vs brute-force numpy oracles."""
import numpy as np

import jax.numpy as jnp

from hamer_yolo_tpu.ops import pointnet as P


def np_fps(xyz, npoint):
    N = xyz.shape[0]
    idxs = [0]
    mind = np.full(N, np.inf)
    for _ in range(npoint - 1):
        d = ((xyz - xyz[idxs[-1]]) ** 2).sum(-1)
        mind = np.minimum(mind, d)
        idxs.append(int(np.argmax(mind)))
    return np.array(idxs)


class TestFPS:
    def test_matches_numpy(self, rng):
        xyz = rng.normal(size=(2, 64, 3)).astype(np.float32)
        out = np.asarray(P.furthest_point_sampling(jnp.asarray(xyz), 16))
        for b in range(2):
            np.testing.assert_array_equal(out[b], np_fps(xyz[b], 16))

    def test_spread(self, rng):
        """FPS samples are farther apart than random samples."""
        xyz = rng.normal(size=(1, 256, 3)).astype(np.float32)
        idx = np.asarray(P.furthest_point_sampling(jnp.asarray(xyz), 32))[0]
        pts = xyz[0][idx]
        d = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        rand = xyz[0][:32]
        dr = ((rand[:, None] - rand[None]) ** 2).sum(-1)
        np.fill_diagonal(dr, np.inf)
        assert d.min() > dr.min()


class TestBallQuery:
    def test_semantics(self, rng):
        xyz = rng.uniform(-1, 1, (1, 100, 3)).astype(np.float32)
        centers = xyz[:, :5]
        r, k = 0.5, 8
        idx = np.asarray(P.ball_query(jnp.asarray(centers), jnp.asarray(xyz), r, k))
        d2 = ((centers[0][:, None] - xyz[0][None]) ** 2).sum(-1)
        for s in range(5):
            within = np.where(d2[s] < r * r)[0]
            expect = list(within[:k])
            if len(expect) < k:
                expect += [within[0]] * (k - len(expect))
            np.testing.assert_array_equal(idx[0, s], expect)

    def test_empty_ball(self):
        xyz = jnp.ones((1, 10, 3))
        centers = jnp.full((1, 1, 3), 100.0)
        idx = np.asarray(P.ball_query(centers, xyz, 0.1, 4))
        np.testing.assert_array_equal(idx, 0)


class TestInterpolate:
    def test_three_nn_and_interp(self, rng):
        known = rng.normal(size=(1, 20, 3)).astype(np.float32)
        unknown = rng.normal(size=(1, 8, 3)).astype(np.float32)
        feats = rng.normal(size=(1, 20, 4)).astype(np.float32)
        d, idx = P.three_nn(jnp.asarray(unknown), jnp.asarray(known))
        d2 = ((unknown[0][:, None] - known[0][None]) ** 2).sum(-1)
        for i in range(8):
            np.testing.assert_array_equal(
                np.sort(np.asarray(idx)[0, i]), np.sort(np.argsort(d2[i])[:3])
            )
        w = P.interpolation_weights(d)
        out = P.three_interpolate(jnp.asarray(feats), idx, w)
        assert out.shape == (1, 8, 4)
        np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-6)

    def test_interp_exact_at_known_points(self, rng):
        known = rng.normal(size=(1, 20, 3)).astype(np.float32)
        feats = rng.normal(size=(1, 20, 4)).astype(np.float32)
        d, idx = P.three_nn(jnp.asarray(known[:, :5]), jnp.asarray(known))
        w = P.interpolation_weights(d)
        out = np.asarray(P.three_interpolate(jnp.asarray(feats), idx, w))
        np.testing.assert_allclose(out, feats[:, :5], atol=1e-4)


class TestGrouping:
    def test_query_and_group_shapes(self, rng):
        xyz = rng.uniform(-1, 1, (2, 50, 3)).astype(np.float32)
        new_xyz = xyz[:, :10]
        feats = rng.normal(size=(2, 50, 6)).astype(np.float32)
        out = P.query_and_group(
            jnp.asarray(xyz), jnp.asarray(new_xyz), jnp.asarray(feats), 0.8, 16
        )
        assert out.shape == (2, 10, 16, 9)
        # relative xyz of the center's own slot is ~0 for the first neighbor
        # when the center is one of the points
        assert np.abs(np.asarray(out)[..., :3]).max() <= np.sqrt(3) * 2
