"""ADM evaluator (utils/adm_metrics.py) vs independent oracles.

Oracle strategy: the metric formulas are re-derived here from first
principles (analytic Gaussian FID cases, brute-force O(N^2) numpy manifold
membership) rather than transcribed from the module, so a transcription bug
in either place shows up as a mismatch."""
import numpy as np
import pytest

from fluidnexus_tpu.utils import adm_metrics as am


def test_frechet_identical_is_zero():
    rng = np.random.default_rng(0)
    acts = rng.normal(size=(400, 16))
    s = am.compute_statistics(acts)
    assert abs(s.frechet_distance(am.compute_statistics(acts.copy()))) < 1e-8


def test_frechet_mean_shift_analytic():
    # equal covariances: FID == |mu1 - mu2|^2 exactly
    rng = np.random.default_rng(1)
    a = rng.normal(size=(2000, 8))
    shift = np.arange(8) * 0.5
    s1, s2 = am.compute_statistics(a), am.compute_statistics(a + shift)
    assert s1.frechet_distance(s2) == pytest.approx(float((shift ** 2).sum()), rel=1e-6)


def test_frechet_diagonal_analytic():
    # diagonal covariances A=aI, B=bI: FID = d*(a + b - 2*sqrt(ab))
    d = 6
    s1 = am.ADMStatistics(np.zeros(d), 4.0 * np.eye(d))
    s2 = am.ADMStatistics(np.zeros(d), 9.0 * np.eye(d))
    assert s1.frechet_distance(s2) == pytest.approx(d * (4 + 9 - 2 * 6.0), rel=1e-9)


def test_frechet_matches_eigh_formulation():
    # cross-check scipy-sqrtm path against the (independent) eigh-based
    # double-sqrt formulation in video_metrics on well-conditioned data
    from fluidnexus_tpu.utils.video_metrics import frechet_distance as fd_eigh
    rng = np.random.default_rng(2)
    a = rng.normal(size=(500, 5))
    b = rng.normal(size=(500, 5)) @ np.diag([1, 2, 1, 0.5, 1.5]) + 0.3
    ours = am.compute_statistics(a).frechet_distance(am.compute_statistics(b))
    assert ours == pytest.approx(fd_eigh(a, b), rel=1e-3)


def test_inception_score_bounds():
    # uniform predictions -> IS 1; concentrated + diverse -> num_classes
    n, k = 600, 10
    assert am.inception_score(np.full((n, k), 1.0 / k)) == pytest.approx(1.0)
    onehot = np.full((n, k), 1e-12)
    onehot[np.arange(n), np.arange(n) % k] = 1.0
    onehot /= onehot.sum(1, keepdims=True)
    assert am.inception_score(onehot) == pytest.approx(k, rel=1e-3)


def test_inception_score_split_semantics():
    rng = np.random.default_rng(3)
    p = rng.dirichlet(np.ones(7), size=900)
    # split_size 300 -> mean of three per-split scores
    per_split = [am.inception_score(p[i:i + 300]) for i in (0, 300, 600)]
    assert am.inception_score(p, split_size=300) == pytest.approx(np.mean(per_split))


def test_pairwise_sq_distances_vs_cdist():
    from scipy.spatial.distance import cdist
    rng = np.random.default_rng(4)
    u, v = rng.normal(size=(33, 12)), rng.normal(size=(17, 12))
    np.testing.assert_allclose(am.pairwise_sq_distances(u, v),
                               cdist(u, v) ** 2, rtol=1e-4, atol=1e-4)


def test_manifold_radii_hand_case():
    # colinear points at 0,1,3,7: k=1 radius = squared distance to the
    # nearest OTHER point (rank 1; self sits at rank 0)
    feats = np.array([[0.0], [1.0], [3.0], [7.0]])
    r = am.manifold_radii(feats, nhood_sizes=(1,))
    np.testing.assert_allclose(r[:, 0], [1.0, 1.0, 4.0, 16.0])


def test_manifold_radii_batched_matches_single():
    rng = np.random.default_rng(5)
    feats = rng.normal(size=(50, 6)).astype(np.float32)
    full = am.manifold_radii(feats, nhood_sizes=(3,))
    batched = am.manifold_radii(feats, nhood_sizes=(3,),
                                row_batch_size=7, col_batch_size=11)
    np.testing.assert_allclose(full, batched, rtol=1e-5)


def _brute_precision_recall(ref, sample, k):
    """Independent O(N^2) oracle for improved precision/recall."""
    def radii(feats):
        d = ((feats[:, None] - feats[None]) ** 2).sum(-1)
        return np.sort(d, 1)[:, k]  # rank k including self at rank 0

    r_ref, r_smp = radii(ref), radii(sample)
    d = ((sample[:, None] - ref[None]) ** 2).sum(-1)  # (Ns, Nr)
    precision = np.mean(np.any(d <= r_ref[None, :], axis=1))
    recall = np.mean(np.any(d.T <= r_smp[None, :], axis=1))
    return precision, recall


def test_precision_recall_identical_sets():
    rng = np.random.default_rng(6)
    feats = rng.normal(size=(60, 4)).astype(np.float32)
    p, r = am.precision_recall(feats, feats.copy())
    assert p == 1.0 and r == 1.0


def test_precision_recall_disjoint_clusters():
    rng = np.random.default_rng(7)
    a = rng.normal(size=(40, 4)).astype(np.float32)
    b = rng.normal(size=(40, 4)).astype(np.float32) + 1000.0
    p, r = am.precision_recall(a, b)
    assert p == 0.0 and r == 0.0


def test_precision_recall_vs_bruteforce():
    rng = np.random.default_rng(8)
    ref = rng.normal(size=(45, 5)).astype(np.float32)
    smp = (rng.normal(size=(35, 5)) * 1.4 + 0.5).astype(np.float32)
    p, r = am.precision_recall(ref, smp, row_batch_size=13, col_batch_size=9)
    bp, br = _brute_precision_recall(ref, smp, k=3)
    assert p == pytest.approx(bp) and r == pytest.approx(br)


def test_evaluate_npz_end_to_end(tmp_path):
    rng = np.random.default_rng(9)
    ref = rng.integers(0, 255, size=(24, 32, 32, 3), dtype=np.uint8)
    smp = rng.integers(0, 255, size=(20, 32, 32, 3), dtype=np.uint8)
    ref_p = tmp_path / "ref.npz"
    smp_p = tmp_path / "smp.npz"
    np.savez(ref_p, arr_0=ref)
    np.savez(smp_p, arr_0=smp)
    out = am.evaluate_npz(str(ref_p), str(smp_p))
    assert set(out) == {"FID", "sFID", "Precision", "Recall"}
    assert np.isfinite(list(out.values())).all()
    # reference CLI parity: results yaml lands next to the sample batch
    import yaml
    with open(tmp_path / "evaluation_metrics.yaml") as f:
        assert yaml.safe_load(f).keys() == out.keys()
    # same-distribution batches: FID small vs a shifted sample batch
    np.savez(smp_p, arr_0=np.clip(ref[:20] // 2, 0, 255).astype(np.uint8))
    out_far = am.evaluate_npz(str(ref_p), str(smp_p), write_results=False)
    assert out_far["FID"] > out["FID"]


def test_evaluate_npz_precomputed_stats(tmp_path):
    rng = np.random.default_rng(10)
    ref = rng.integers(0, 255, size=(24, 16, 16, 3), dtype=np.uint8)
    smp = rng.integers(0, 255, size=(20, 16, 16, 3), dtype=np.uint8)
    pool, spatial = am.default_feature_fn(ref)
    rs, rss = am.compute_statistics(pool), am.compute_statistics(spatial)
    ref_p, smp_p = tmp_path / "ref.npz", tmp_path / "smp.npz"
    np.savez(ref_p, mu=rs.mu, sigma=rs.sigma, mu_s=rss.mu, sigma_s=rss.sigma)
    np.savez(smp_p, arr_0=smp)
    out = am.evaluate_npz(str(ref_p), str(smp_p), write_results=False)
    # stats-only ref: FID/sFID computable, P/R not (needs raw features)
    assert "FID" in out and "sFID" in out and "Precision" not in out
    # and it matches the raw-image path
    np.savez(ref_p, arr_0=ref)
    full = am.evaluate_npz(str(ref_p), str(smp_p), write_results=False)
    assert out["FID"] == pytest.approx(full["FID"], rel=1e-6)
    assert out["sFID"] == pytest.approx(full["sFID"], rel=1e-6)


def test_evaluate_activations_with_probs():
    rng = np.random.default_rng(11)
    ref = rng.normal(size=(50, 12)).astype(np.float32)
    smp = rng.normal(size=(40, 12)).astype(np.float32)
    w = rng.normal(size=(12, 9)).astype(np.float32)
    probs = am.softmax_probs(smp, w)
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-5)
    out = am.evaluate_activations(ref, smp, sample_probs=probs)
    assert {"IS", "FID", "Precision", "Recall"} <= set(out)
    assert out["IS"] >= 1.0
