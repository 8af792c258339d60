"""Evaluation-stack tests: streaming stats vs numpy oracles, metric math,
end-to-end metrics with fake detectors over tiny video dirs."""

import os

import numpy as np
import pytest

from latte_tpu.eval.feature_stats import FeatureStats, cache_path
from latte_tpu.eval.scores import frechet_distance, inception_score, kernel_distance
from latte_tpu.utils import save_video


class TestFeatureStats:
    def test_mean_cov_matches_numpy(self, rng_np):
        x = rng_np.standard_normal((500, 8)).astype(np.float32)
        stats = FeatureStats(capture_mean_cov=True)
        for chunk in np.split(x, 10):
            stats.append(chunk)
        mean, cov = stats.get_mean_cov()
        np.testing.assert_allclose(mean, x.mean(0), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            cov, np.cov(x.T, bias=True), rtol=1e-4, atol=1e-5
        )

    def test_max_items_cap(self, rng_np):
        stats = FeatureStats(capture_all=True, max_items=10)
        stats.append(rng_np.standard_normal((7, 4)))
        stats.append(rng_np.standard_normal((7, 4)))
        assert stats.num_items == 10
        assert stats.is_full()
        assert stats.get_all().shape == (10, 4)

    def test_save_load(self, tmp_path, rng_np):
        stats = FeatureStats(capture_mean_cov=True)
        stats.append(rng_np.standard_normal((20, 4)))
        p = str(tmp_path / "s.pkl")
        stats.save(p)
        back = FeatureStats.load(p)
        np.testing.assert_array_equal(back.raw_mean, stats.raw_mean)

    def test_cache_path_stable(self, tmp_path):
        a = cache_path(str(tmp_path), "x", 16, 2048)
        b = cache_path(str(tmp_path), "x", 16, 2048)
        c = cache_path(str(tmp_path), "y", 16, 2048)
        assert a == b != c


class TestScores:
    def test_frechet_identical_is_zero(self, rng_np):
        x = rng_np.standard_normal((1000, 6))
        mu, cov = x.mean(0), np.cov(x.T, bias=True)
        assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-6

    def test_frechet_grows_with_shift(self, rng_np):
        x = rng_np.standard_normal((1000, 6))
        mu, cov = x.mean(0), np.cov(x.T, bias=True)
        d1 = frechet_distance(mu, cov, mu + 0.5, cov)
        d2 = frechet_distance(mu, cov, mu + 2.0, cov)
        assert 0 < d1 < d2
        np.testing.assert_allclose(d1, 6 * 0.25, rtol=0.01)  # ||dmu||² term

    def test_kid_zero_for_same_distribution(self, rng_np):
        x = rng_np.standard_normal((500, 16))
        y = rng_np.standard_normal((500, 16))
        same = kernel_distance(x, y, num_subsets=20, max_subset_size=100)
        far = kernel_distance(x, y + 3.0, num_subsets=20, max_subset_size=100)
        assert abs(same) < 0.1
        assert far > 10 * max(abs(same), 1e-6)

    def test_inception_score_bounds(self):
        # uniform predictions -> IS == 1
        probs = np.full((100, 10), 0.1)
        mean, std = inception_score(probs)
        np.testing.assert_allclose(mean, 1.0, rtol=1e-5)
        # one-hot diverse predictions -> IS == num classes
        probs = np.eye(10)[np.arange(100) % 10]
        mean, _ = inception_score(probs + 1e-12)
        np.testing.assert_allclose(mean, 10.0, rtol=1e-3)


def fake_video_detector(x, **kwargs):
    """(B, C, F, H, W) -> (B, 32) deterministic projection."""
    b = x.shape[0]
    flat = x.reshape(b, -1).astype(np.float64)
    rng = np.random.default_rng(42)
    proj = rng.standard_normal((flat.shape[1], 32)) / np.sqrt(flat.shape[1])
    return (flat @ proj).astype(np.float32)


def make_video_dir(path, n, seed, shift=0.0, frames=8):
    rng = np.random.default_rng(seed)
    for i in range(n):
        v = np.clip(rng.random((frames, 32, 32, 3)) * 255 + shift, 0, 255).astype(
            np.uint8
        )
        save_video(os.path.join(path, f"{i:04d}.mp4"), v)


class TestMetricsEndToEnd:
    def test_fvd_same_vs_shifted(self, tmp_path):
        from latte_tpu.eval.metrics import calc_metric

        real = str(tmp_path / "real")
        fake_same = str(tmp_path / "fake_same")
        fake_far = str(tmp_path / "fake_far")
        make_video_dir(real, 12, seed=0)
        make_video_dir(fake_same, 12, seed=1)
        make_video_dir(fake_far, 12, seed=2, shift=120.0)

        common = dict(
            detector=fake_video_detector,
            max_real=12,
            max_fake=12,
            num_frames=8,
        )
        r_same = calc_metric(
            "fvd2048_16f",
            report_dir=str(tmp_path / "rep"),
            real_path=real,
            fake_path=fake_same,
            **common,
        )
        r_far = calc_metric(
            "fvd2048_16f", real_path=real, fake_path=fake_far, **common
        )
        v_same = r_same["results"]["fvd2048_16f"]
        v_far = r_far["results"]["fvd2048_16f"]
        assert v_far > v_same
        # jsonl report written
        assert os.path.exists(tmp_path / "rep" / "metric-fvd2048_16f.jsonl")

    def test_registry_contents(self):
        from latte_tpu.eval.metrics import list_metrics

        expected = {
            "fvd2048_16f",
            "fvd2048_128f",
            "fvd2048_128f_subsample8f",
            "isv2048_ucf",
            "fid50k_full",
            "kid50k_full",
            "is50k",
        }
        assert expected <= set(list_metrics())
