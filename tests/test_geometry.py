"""Golden tests for the geometry core.

Goldens are independent numpy transcriptions of the reference semantics
(dataset_train_realestate10k.py:28-92, epi_module.py:284-346,
ray_condition:168-210), including the brute-force O(HW^2) band max that the
production code replaces with the exact corner maximum.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvd_tpu import geometry as G


# ---------- numpy goldens ----------------------------------------------------

def np_cross_matrix(v):
    return np.array(
        [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], dtype=np.float64
    )


def np_fundamental(T, K1, K2):
    R, t = T[:3, :3], T[:3, 3]
    t_ess = -R.T @ t
    E = R @ np_cross_matrix(t_ess)
    return np.linalg.inv(K2).T @ E @ np.linalg.inv(K1)


def np_attn_bias(F_mats, feat_size, S, pixel_band=3.0, decay_alpha=3.0,
                 ff_period=None, lines_override=None):
    """Direct transcription of EpiEncoding.get_attn_map with full-matrix max."""
    f = feat_size
    xs, ys = np.meshgrid(np.arange(f), np.arange(f), indexing="xy")
    coords = np.stack([xs, ys, np.ones_like(xs)], -1).reshape(-1, 3).astype(np.float64)
    coords = (S / f) * coords + (S / f - 1) / 2
    coords[:, 2] = 1
    B = F_mats.shape[0]
    L = np.einsum("bij,qj->bqi", F_mats, coords)
    if ff_period is not None:
        # horizontal pseudo lines through each pixel for first frames
        pl = np.stack(
            [np.zeros(f * f), -np.ones(f * f), coords[:, 1]], axis=-1
        )
        for b in range(0, B, ff_period):
            L[b] = pl
    if lines_override is not None:
        L = lines_override
    ab = np.sqrt((L[:, :, :2] ** 2).sum(-1))[:, :, None]
    cfc = np.abs(np.einsum("bqi,bki->bqk", L, np.repeat(coords[None], B, 0)))
    cfc = cfc / (ab + 1e-6)
    band = (pixel_band / (S // 2) * cfc.reshape(B, -1).max(-1))[:, None, None]
    decay = decay_alpha / (band + 1e-6)
    bias = -np.clip(cfc - band, 0, None) * decay
    return np.nan_to_num(bias, nan=0.0, posinf=0.0, neginf=0.0)


def random_pose_pair(rng):
    from scipy.spatial.transform import Rotation

    c2w = np.eye(4)
    c2w[:3, :3] = Rotation.random(random_state=rng).as_matrix()
    c2w[:3, 3] = rng.standard_normal(3) * 0.5
    return c2w


# ---------- tests -------------------------------------------------------------

def test_cross_product_matrix():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((5, 3))
    ours = np.asarray(G.cross_product_matrix(jnp.asarray(v)))
    for i in range(5):
        np.testing.assert_allclose(ours[i], np_cross_matrix(v[i]), atol=1e-6)
        w = rng.standard_normal(3)
        np.testing.assert_allclose(ours[i] @ w, np.cross(v[i], w), atol=1e-5)


def test_fundamental_matrix_matches_golden_and_epipolar_constraint():
    rng = np.random.default_rng(1)
    for _ in range(4):
        c2w_1, c2w_2 = random_pose_pair(rng), random_pose_pair(rng)
        K1 = np.array([[200.0, 0, 128], [0, 210.0, 120], [0, 0, 1]])
        K2 = np.array([[190.0, 0, 130], [0, 195.0, 125], [0, 0, 1]])
        T = np.linalg.inv(c2w_2) @ c2w_1
        golden = np_fundamental(T, K1, K2)
        ours = np.asarray(
            G.fundamental_from_transform(jnp.asarray(T), jnp.asarray(K1), jnp.asarray(K2))
        )
        # f32 on-device inverse vs f64 golden: ~0.5% relative is expected
        np.testing.assert_allclose(ours, golden, rtol=1e-2, atol=1e-5)

        # epipolar constraint on an actual 3D point
        X = rng.standard_normal(3) + np.array([0, 0, 4.0])
        x1h = K1 @ (np.linalg.inv(c2w_1) @ np.append(X, 1.0))[:3]
        x2h = K2 @ (np.linalg.inv(c2w_2) @ np.append(X, 1.0))[:3]
        p1, p2 = x1h / x1h[2], x2h / x2h[2]
        scale = np.abs(golden).max()
        assert abs(p2 @ (golden @ p1)) / (scale * 1e4) < 1e-3

        ours2 = np.asarray(
            G.fundamental_between_views(
                jnp.asarray(c2w_1), jnp.asarray(c2w_2), jnp.asarray(K1), jnp.asarray(K2)
            )
        )
        np.testing.assert_allclose(ours2, golden, rtol=1e-2, atol=1e-5)


def test_epipolar_bias_matches_bruteforce_golden():
    rng = np.random.default_rng(2)
    feat, S, B = 8, 256, 6
    F = rng.standard_normal((B, 3, 3)) * 1e-3
    golden = np_attn_bias(F.copy(), feat, S)
    ours = np.asarray(
        G.epipolar_attn_bias(
            jnp.asarray(F, jnp.float32), feat, S, first_frame_period=None
        )
    )
    np.testing.assert_allclose(ours, golden, rtol=1e-3, atol=1e-4)
    assert (ours <= 0).all()


def test_epipolar_bias_first_frame_horizontal_lines():
    rng = np.random.default_rng(3)
    feat, S, B = 4, 64, 4
    F = rng.standard_normal((B, 3, 3)) * 1e-2
    golden = np_attn_bias(F.copy(), feat, S, ff_period=2)
    ours = np.asarray(
        G.epipolar_attn_bias(
            jnp.asarray(F, jnp.float32), feat, S,
            first_frame_period=2, rand_slope_first_frame=False,
        )
    )
    np.testing.assert_allclose(ours, golden, rtol=1e-3, atol=1e-4)


def test_epipolar_bias_zero_on_own_line():
    # keys exactly on the epipolar line get bias 0
    feat, S = 8, 256
    # horizontal-line pseudo path via identity: use explicit pseudo lines
    coords = np.asarray(G.epipolar_mask_coords(feat, S)) if hasattr(G, "epipolar_mask_coords") else None
    bias = np.asarray(
        G.epipolar_attn_bias(None, feat, S, batch_size=2, rng=jax.random.key(0))
    )
    # each query's own pixel lies on its pseudo line -> diagonal is 0
    diag = np.abs(np.diagonal(bias, axis1=1, axis2=2))
    assert diag.max() < 1e-5


def test_homography_path_runs_and_is_nonpositive():
    rng = np.random.default_rng(4)
    H = np.repeat(np.eye(3)[None], 3, 0) + rng.standard_normal((3, 3, 3)) * 0.01
    bias = np.asarray(
        G.epipolar_attn_bias(
            None, 8, 256, H_mats=jnp.asarray(H, jnp.float32), rng=jax.random.key(1)
        )
    )
    assert bias.shape == (3, 64, 64)
    assert (bias <= 0).all() and np.isfinite(bias).all()


def test_ray_condition_matches_golden():
    rng = np.random.default_rng(5)
    B, V, Hh, Ww = 1, 2, 8, 8
    K = np.array([[200.0, 210.0, 4.0, 4.0]] * V)[None]
    c2w = np.stack([random_pose_pair(rng) for _ in range(V)])[None]

    ours = np.asarray(G.ray_condition(jnp.asarray(K), jnp.asarray(c2w), Hh, Ww))

    # golden: direct per-pixel computation
    for v in range(V):
        for y in range(Hh):
            for x in range(0, Ww, 3):
                i, j = x + 0.5, y + 0.5
                d = np.array([(i - 4.0) / 200.0, (j - 4.0) / 210.0, 1.0])
                d = d / np.linalg.norm(d)
                dw = c2w[0, v, :3, :3] @ d
                o = c2w[0, v, :3, 3]
                exp = np.concatenate([np.cross(o, dw), dw])
                np.testing.assert_allclose(ours[0, v, y, x], exp, atol=1e-5)


def test_fold_indices_and_f_mats():
    idx = G.fold_indices(4)
    np.testing.assert_array_equal(idx, [3, 2, 1, 0, 3, 4, 5, 6])
    F = np.arange(2 * 9, dtype=np.float64).reshape(2, 3, 3)
    folded = G.fold_fundamental_mats(F)
    assert folded.shape == (4, 3, 3)
    np.testing.assert_array_equal(folded[2], F[0].T)


def test_folded_pair_f_mats_epipolar_constraint():
    rng = np.random.default_rng(6)
    n = 3
    c2w = np.stack([random_pose_pair(rng) for _ in range(2 * n - 1)])
    K = np.repeat(np.array([[150.0, 0, 64], [0, 150.0, 64], [0, 0, 1]])[None], 2 * n - 1, 0)
    from cvd_tpu.geometry.folding import folded_pair_F_mats

    F = folded_pair_F_mats(c2w, K, n)
    assert F.shape == (2 * n, 3, 3)
    # frame i of video 1 (clip idx n-1-i) to frame i of video 2 (clip idx n-1+i)
    i = 1
    sid, tid = n - 1 - i, n - 1 + i
    T = np.linalg.inv(c2w[tid]) @ c2w[sid]
    golden = np_fundamental(T, K[sid], K[tid])
    np.testing.assert_allclose(F[i], golden, rtol=1e-3, atol=1e-5)


def test_relative_poses():
    rng = np.random.default_rng(7)
    c2w = np.stack([random_pose_pair(rng) for _ in range(5)])
    rel = G.relative_poses(c2w, tar_idx=2)
    np.testing.assert_allclose(rel[2], np.eye(4), atol=1e-6)
    # relative transforms between any two frames are preserved
    a = np.linalg.inv(c2w[1]) @ c2w[4]
    b = np.linalg.inv(rel[1]) @ rel[4]
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_trajectories_shapes_and_start_identity():
    for fn in (G.circle_trajectory, G.upper_hemi_trajectory, G.interpolate_trajectories):
        c2ws = fn(4, 16, camera_dist=1.0)
        assert c2ws.shape == (64, 4, 4)
        for v in range(4):
            np.testing.assert_allclose(c2ws[v * 16], np.eye(4), atol=1e-12)
            # rotations stay orthonormal through slerp
            Rm = c2ws[v * 16 + 8, :3, :3]
            np.testing.assert_allclose(Rm @ Rm.T, np.eye(3), atol=1e-8)


def test_camera_parsing():
    line = "100 0.5 0.6 0.5 0.5 0 0 " + " ".join(
        str(x) for x in np.eye(4)[:3].reshape(-1)
    )
    cams = G.parse_pose_lines([line])
    assert len(cams) == 1 and cams[0].fx == 0.5
    np.testing.assert_allclose(cams[0].w2c, np.eye(4))
    K, intr = G.intrinsics_for_crop(cams[0], 720, 1280, 256)
    # fx = W * rescale * fx_norm ; rescale = 256/720
    np.testing.assert_allclose(K[0, 0], 1280 * (256 / 720) * 0.5)
    np.testing.assert_allclose(K[1, 2], (720 * 0.5 - 0) * (256 / 720))


def test_get_relative_pose_flag_semantics():
    """inference_epi_advanced.py:55-72: zero_first_frame_scale=True collapses
    to identity-first normalization; False keeps the first camera's distance
    from the origin (canonical pose at (0, -||t0||, 0))."""
    from cvd_tpu.geometry.cameras import get_relative_pose, relative_poses

    rng = np.random.default_rng(3)
    c2w = np.tile(np.eye(4), (4, 1, 1))
    # random small rotations + translations, non-identity first pose
    for i in range(4):
        a = rng.normal(0, 0.1)
        c2w[i, :3, :3] = [[np.cos(a), -np.sin(a), 0],
                          [np.sin(a), np.cos(a), 0], [0, 0, 1]]
        c2w[i, :3, 3] = rng.normal(0, 1.0, 3)
    zeroed = get_relative_pose(c2w, True)
    np.testing.assert_allclose(zeroed, relative_poses(c2w, 0), atol=1e-5)
    kept = get_relative_pose(c2w, False)
    d = np.linalg.norm(c2w[0, :3, 3])
    np.testing.assert_allclose(kept[0, :3, 3], [0, -d, 0], atol=1e-6)
    # relative transforms between consecutive cameras are preserved
    for i in range(3):
        rel_abs = np.linalg.inv(c2w[i]) @ c2w[i + 1]
        rel_new = np.linalg.inv(kept[i]) @ kept[i + 1]
        np.testing.assert_allclose(rel_new, rel_abs, atol=1e-6)


def test_zero_first_frame_scale_threads_into_validation(tmp_path):
    """The flag changes the loaded validation poses (no longer a no-op)."""
    from cvd_tpu.data.validation import load_pair_cameras

    def write(path, seed):
        rng2 = np.random.default_rng(seed)
        with open(path, "w") as f:
            f.write("url\n")
            for i in range(4):
                w2c = np.eye(4)[:3].copy()
                w2c[:3, 3] = rng2.normal(0, 1, 3) + [0, 0, 2]
                vals = [i, 0.6, 0.8, 0.5, 0.5, 0, 0] + list(w2c.reshape(-1))
                f.write(" ".join(str(v) for v in vals) + "\n")

    p0, p1 = tmp_path / "a.txt", tmp_path / "b.txt"
    write(p0, 0)
    write(p1, 1)
    c2w_zero, _, _ = load_pair_cameras(str(p0), str(p1), 64, 4, True)
    c2w_keep, _, _ = load_pair_cameras(str(p0), str(p1), 64, 4, False)
    assert not np.allclose(c2w_zero, c2w_keep)
