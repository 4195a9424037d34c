"""FID harness: Fréchet-distance math golden tests."""
import numpy as np

from dmtpu.eval import compute_statistics, fid_from_features, frechet_distance


def test_frechet_identical_is_zero():
    rs = np.random.RandomState(0)
    f = rs.randn(500, 16)
    assert abs(fid_from_features(f, f)) < 1e-6


def test_frechet_mean_shift_analytic():
    """For equal covariances, FID == ||mu1 - mu2||^2."""
    rs = np.random.RandomState(1)
    base = rs.randn(20000, 8)
    shift = np.zeros(8)
    shift[0] = 3.0
    m1, s1 = compute_statistics(base)
    m2, s2 = compute_statistics(base + shift)
    d = frechet_distance(m1, s1, m2, s2)
    np.testing.assert_allclose(d, 9.0, rtol=1e-4, atol=1e-4)


def test_frechet_diagonal_analytic():
    """Diagonal Gaussians: FID = |mu|^2 + sum (sqrt(s1)-sqrt(s2))^2."""
    mu1 = np.zeros(4)
    mu2 = np.array([1.0, 0, 0, 0])
    s1 = np.diag([1.0, 2.0, 3.0, 4.0])
    s2 = np.diag([2.0, 2.0, 1.0, 4.0])
    want = 1.0 + sum((np.sqrt(a) - np.sqrt(b)) ** 2 for a, b in
                     zip([1, 2, 3, 4.0], [2, 2, 1, 4.0]))
    got = frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_monotone_in_noise():
    rs = np.random.RandomState(2)
    ref = rs.randn(2000, 8)
    d_small = fid_from_features(ref, ref + 0.1 * rs.randn(2000, 8))
    d_big = fid_from_features(ref, ref + 1.0 * rs.randn(2000, 8))
    assert 0 < d_small < d_big


def test_inception_score_bounds():
    from dmtpu.eval import inception_score

    rs = np.random.RandomState(3)
    # uniform predictions -> IS == 1
    uniform = np.full((1000, 10), 0.1)
    m, s = inception_score(uniform)
    np.testing.assert_allclose(m, 1.0, rtol=1e-6)
    # confident + diverse predictions -> IS == num classes
    onehot = np.eye(10)[rs.randint(0, 10, 1000)] * 0.999 + 1e-4
    m2, _ = inception_score(onehot / onehot.sum(1, keepdims=True))
    assert 8.0 < m2 <= 10.01


def test_clip_extractor_works_with_raw_flax_module():
    """Regression: FlaxCLIPModule has no get_image_features; the extractor
    must project the vision pooler output itself."""
    from transformers import CLIPConfig, FlaxCLIPModel

    from dmtpu.eval import CLIPFeatureExtractor

    cfg = CLIPConfig(
        text_config=dict(hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=4),
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=32, patch_size=8),
        projection_dim=16)
    m = FlaxCLIPModel(cfg)
    ext = CLIPFeatureExtractor(module=m.module, params={"params": m.params},
                              image_size=32, batch_size=4)
    feats = ext(np.zeros((6, 16, 16, 3), np.uint8))
    assert feats.shape == (6, 16)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, rtol=1e-4)


def test_kid_matches_naive_mmd_and_behaves():
    """polynomial_mmd2 equals an O(n^2)-loop unbiased MMD^2 oracle; KID is
    ~0 within-distribution and grows under a mean shift (torch-fidelity's
    kernel: (x.y/d + 1)^3)."""
    from dmtpu.eval.fid import kid_from_features, polynomial_mmd2

    rs = np.random.RandomState(0)
    f1 = rs.randn(12, 5)
    f2 = rs.randn(10, 5) + 0.3

    def k(x, y, d=5):
        return (x @ y / d + 1.0) ** 3

    m, n = len(f1), len(f2)
    tx = sum(k(f1[i], f1[j]) for i in range(m) for j in range(m) if i != j) / (m * (m - 1))
    ty = sum(k(f2[i], f2[j]) for i in range(n) for j in range(n) if i != j) / (n * (n - 1))
    txy = sum(k(f1[i], f2[j]) for i in range(m) for j in range(n)) / (m * n)
    want = tx + ty - 2 * txy
    np.testing.assert_allclose(polynomial_mmd2(f1, f2), want, rtol=1e-10)

    same_a = rs.randn(400, 8)
    same_b = rs.randn(400, 8)
    near, _ = kid_from_features(same_a, same_b, subsets=8, subset_size=100)
    far, far_std = kid_from_features(same_a, same_b + 1.0, subsets=8, subset_size=100)
    assert abs(near) < 0.05  # unbiased estimator ~ 0 (can be slightly negative)
    assert far > near + 1.0 and far_std >= 0
    # deterministic under the same seed
    assert kid_from_features(f1, f2, subsets=3, subset_size=6) == \
        kid_from_features(f1, f2, subsets=3, subset_size=6)
