"""Metric math tests on synthetic features + InceptionV3 structure checks."""

import numpy as np
import pytest

from phendiff_tpu.metrics import (
    FeatureCache,
    MetricsConfig,
    calculate_metrics,
    fid_from_features,
    isc_from_logits,
    kid_from_features,
)


def _gauss(n, d, mu, seed):
    return np.random.default_rng(seed).standard_normal((n, d)) + mu


def test_fid_zero_for_identical_sets():
    f = _gauss(500, 16, 0.0, 0)
    assert fid_from_features(f, f.copy()) == pytest.approx(0.0, abs=1e-6)


def test_fid_orders_by_shift():
    real = _gauss(500, 16, 0.0, 1)
    near = _gauss(500, 16, 0.1, 2)
    far = _gauss(500, 16, 2.0, 3)
    assert fid_from_features(real, near) < fid_from_features(real, far)
    # mean shift of m in every dim → FID ≈ d * m^2 for equal covs
    assert fid_from_features(real, far) == pytest.approx(16 * 4.0, rel=0.2)


def test_isc_uniform_vs_peaked():
    n, c = 200, 10
    uniform = np.zeros((n, c))
    peaked = np.full((n, c), -50.0)
    peaked[np.arange(n), np.arange(n) % c] = 50.0
    s_uniform = isc_from_logits(uniform)["inception_score_mean"]
    s_peaked = isc_from_logits(peaked)["inception_score_mean"]
    assert s_uniform == pytest.approx(1.0, abs=1e-3)
    assert s_peaked > 5.0  # diverse + confident → high IS


def test_kid_zero_same_distribution():
    real = _gauss(400, 8, 0.0, 4)
    fake = _gauss(400, 8, 0.0, 5)
    far = _gauss(400, 8, 1.0, 6)
    k_same = kid_from_features(real, fake, subset_size=100, num_subsets=20)
    k_far = kid_from_features(real, far, subset_size=100, num_subsets=20)
    assert abs(k_same["kernel_inception_distance_mean"]) < 0.05
    assert k_far["kernel_inception_distance_mean"] > k_same["kernel_inception_distance_mean"]


def test_calculate_metrics_kid_autodisable():
    real = _gauss(50, 8, 0.0, 7)
    fake = _gauss(50, 8, 0.0, 8)
    out = calculate_metrics(
        fake, real, config=MetricsConfig(fid=True, kid=True, kid_subset_size=1000)
    )
    assert "frechet_inception_distance" in out
    assert not any(k.startswith("kernel") for k in out)  # reference behavior


def test_feature_cache_roundtrip(tmp_path):
    cache = FeatureCache(str(tmp_path))
    calls = []

    def compute():
        calls.append(1)
        return {"features": np.ones((3, 4))}

    a = cache.get_or_compute("classA", compute)
    b = cache.get_or_compute("classA", compute)
    assert len(calls) == 1  # second call served from disk
    np.testing.assert_array_equal(a["features"], b["features"])


def test_inception_runs_tiny():
    """Structure check: random-init InceptionV3 produces 2048-d features.
    (Full-resolution run is exercised on TPU; here one tiny forward.)"""
    from phendiff_tpu.metrics.inception import InceptionExtractor

    ext = InceptionExtractor()
    assert not ext.pretrained
    imgs = np.random.default_rng(0).random((2, 75, 75, 3), dtype=np.float32)
    f, l = ext(imgs)
    assert f.shape == (2, 2048)
    assert l.shape == (2, 1008)
    assert np.isfinite(np.asarray(f)).all()
