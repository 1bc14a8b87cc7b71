import numpy as np

from fluidnexus_tpu.utils.video_metrics import frechet_distance, frechet_video_distance


def test_frechet_distance_zero_for_same_distribution():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 8))
    assert frechet_distance(a, a.copy()) < 1e-6


def test_frechet_distance_grows_with_shift():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 8))
    b_near = a + 0.1
    b_far = a + 2.0
    d_near = frechet_distance(a, b_near)
    d_far = frechet_distance(a, b_far)
    assert 0 < d_near < d_far
    np.testing.assert_allclose(d_far, 8 * 4.0, rtol=0.05)  # |mu shift|^2 = 8*(2^2)


def test_fvd_on_clips():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (8, 4, 16, 16, 3))
    b = np.clip(a + rng.normal(scale=0.3, size=a.shape), 0, 1)
    same = frechet_video_distance(a, a.copy())
    diff = frechet_video_distance(a, b)
    assert same < 1e-4
    assert diff > same
