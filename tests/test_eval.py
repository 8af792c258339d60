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
        assert abs(same) < 100.0  # x1000 scale: raw MMD < 0.1
        assert far > 10 * max(abs(same), 1e-3)

    def test_inception_score_bounds(self):
        # uniform predictions -> IS == 1
        probs = np.full((100, 10), 0.1)
        mean, std = inception_score(probs)
        np.testing.assert_allclose(mean, 1.0, rtol=1e-5)
        # one-hot diverse predictions -> IS == num classes
        probs = np.eye(10)[np.arange(100) % 10]
        mean, _ = inception_score(probs + 1e-12)
        np.testing.assert_allclose(mean, 10.0, rtol=1e-3)

    def test_kid_reference_scale_x1000(self, rng_np):
        """Exact replica of the reference formula
        (`kernel_inception_distance.py:35-44` including the final *1000)
        with the same subset draws."""
        x = rng_np.standard_normal((60, 8))
        y = rng_np.standard_normal((60, 8)) + 0.5
        seed, num_subsets, m_cap = 7, 5, 20
        got = kernel_distance(x, y, num_subsets=num_subsets, max_subset_size=m_cap, seed=seed)

        n = x.shape[1]
        m = min(min(x.shape[0], y.shape[0]), m_cap)
        rng = np.random.default_rng(seed)
        t = 0.0
        for _ in range(num_subsets):
            xx = y[rng.choice(y.shape[0], m, replace=False)]
            yy = x[rng.choice(x.shape[0], m, replace=False)]
            a = (xx @ xx.T / n + 1) ** 3 + (yy @ yy.T / n + 1) ** 3
            b = (xx @ yy.T / n + 1) ** 3
            t += (a.sum() - np.diag(a).sum()) / (m - 1) - b.sum() * 2 / m
        expected = float(t / num_subsets / m) * 1000.0
        np.testing.assert_allclose(got, expected, rtol=1e-12)

    def test_is_shuffle_seed_matches_reference_order(self, rng_np):
        """isv shuffles with RandomState(42) before splitting
        (`video_inception_score.py:47`): an order-dependent prob set must
        give a different split-mean with vs without the shuffle."""
        # first half confident, second half uniform -> split stats differ
        probs = np.concatenate(
            [np.eye(10)[np.arange(50) % 10] * 0.91 + 0.01, np.full((50, 10), 0.1)]
        )
        m_plain, _ = inception_score(probs, num_splits=5)
        m_shuf, _ = inception_score(probs, num_splits=5, shuffle_seed=42)
        assert m_plain != m_shuf
        # and the shuffle replicates RandomState(42).shuffle exactly
        expected = probs.copy()
        np.random.RandomState(42).shuffle(expected)
        scores = []
        n = len(expected)
        for i in range(5):
            part = expected[i * n // 5 : (i + 1) * n // 5]
            kl = part * (np.log(part) - np.log(part.mean(0, keepdims=True)))
            scores.append(np.exp(np.mean(kl.sum(1))))
        np.testing.assert_allclose(m_shuf, np.mean(scores), rtol=1e-9)


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

    def test_zip_archive_and_dataset_json_labels(self, tmp_path):
        """Reference `tools/utils/dataset.py:286-296,359-396`: metric
        datasets read zip archives of frame dirs with per-video labels."""
        import io as _io
        import json
        import zipfile

        import cv2

        from latte_tpu.eval.dataset import MetricVideoDataset

        zpath = str(tmp_path / "clips.zip")
        labels = {}
        with zipfile.ZipFile(zpath, "w") as z:
            for c in range(3):
                for f in range(6):
                    img = np.full((16, 16, 3), c * 40 + f, np.uint8)
                    ok, buf = cv2.imencode(".png", img)
                    z.writestr(f"clip{c}/{f:03d}.png", buf.tobytes())
                    labels[f"clip{c}/{f:03d}.png"] = c * 10
            z.writestr("dataset.json", json.dumps({"labels": list(labels.items())}))

        ds = MetricVideoDataset(zpath, num_frames=4, seed=0)
        assert len(ds) == 3
        assert ds.has_labels
        clip = ds[0]
        assert clip.shape == (4, 16, 16, 3)
        got = {ds.get_label(i) for i in range(3)}
        assert got == {0, 10, 20}

    def test_flat_mp4_dataset_json_labels(self, tmp_path):
        """Flat mp4 layouts key labels by file stem (relative to the
        dataset root), not by the absolute parent dir name."""
        import json

        from latte_tpu.eval.dataset import MetricVideoDataset
        from latte_tpu.utils import save_video

        root = tmp_path / "vids"
        labels = {}
        for c in range(3):
            frames = np.full((6, 16, 16, 3), c * 40, np.uint8)
            save_video(str(root / f"clip{c}.mp4"), frames, fps=8)
            labels[f"clip{c}.mp4"] = c * 10
        (root / "dataset.json").write_text(
            json.dumps({"labels": list(labels.items())})
        )
        ds = MetricVideoDataset(str(root), num_frames=4, seed=0)
        assert len(ds) == 3 and ds.has_labels
        got = {ds.get_label(i) for i in range(3)}
        assert got == {0, 10, 20}

    def test_image_dataset_iterates_every_frame(self, tmp_path):
        """FID protocol: every frame of every clip is an item
        (`video_to_image_dataset_kwargs`, `dataset.py:470-482`)."""
        from latte_tpu.eval.dataset import MetricImageDataset

        d = str(tmp_path / "vids")
        os.makedirs(d)
        make_video_dir(d, n=3, seed=0, frames=5)
        frames = list(MetricImageDataset(d))
        assert len(frames) == 15
        assert frames[0].shape == (32, 32, 3)

    def test_generator_side_fvd_no_files(self, tmp_path):
        """FVD streamed straight from a generator callable — nothing
        written to disk (reference `metric_utils.py:262-321`)."""
        from latte_tpu.eval.metrics import calc_metric

        real = str(tmp_path / "real")
        os.makedirs(real)
        make_video_dir(real, 8, seed=0)
        rng = np.random.default_rng(3)
        calls = []

        def fake_gen(n):
            calls.append(n)
            # 16 frames: the metric's temporal protocol is enforced
            return (rng.random((4, 16, 32, 32, 3)) * 255).astype(np.uint8)

        r = calc_metric(
            "fvd2048_16f", real_path=real, fake_gen=fake_gen,
            detector=fake_video_detector, max_real=8, max_fake=8,
        )
        assert np.isfinite(r["results"]["fvd2048_16f"])
        assert len(calls) == 2  # 8 items in batches of 4
        assert not any(tmp_path.glob("**/*.mp4.gen"))  # nothing written

    def test_sample_many_generator_to_fvd(self, tmp_path):
        """End-to-end: sample_many's BatchGenerator drives FVD directly
        (no mp4s) with an injected detector."""
        from latte_tpu.config import Config
        from latte_tpu.eval.metrics import calc_metric
        from latte_tpu.sample.sample_many import BatchGenerator
        from latte_tpu.vae.autoencoder_kl import tiny_vae

        real = str(tmp_path / "real")
        os.makedirs(real)
        make_video_dir(real, 4, seed=0, frames=4)

        cfg = Config(
            {
                "model": "Latte-S/2",
                "image_size": 16,
                "num_frames": 16,
                "extras": 1,
                "learn_sigma": True,
                "num_sampling_steps": 2,
                "sample_method": "ddim",
                "per_proc_batch_size": 1,
                "seed": 0,
                "attention_mode": "xla",
                "vae": "tiny",
            }
        )
        gen = BatchGenerator(cfg)
        assert gen.decode is not None, "tiny VAE should be wired"
        r = calc_metric(
            "fvd2048_16f", real_path=real, fake_gen=gen,
            detector=fake_video_detector, max_real=4,
            max_fake=2 * gen.global_batch,
        )
        assert np.isfinite(r["results"]["fvd2048_16f"])
        assert gen.it >= 1

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


class TestStandinPipeline:
    """End-to-end protocol chain with the deterministic stand-in detector
    (runs/metrics_standin is the full-scale recorded artifact)."""

    def _make_dirs(self, tmp_path):
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from scripts.make_tiny_dataset import make_clip
        from latte_tpu.tools.convert_videos_to_frames import convert_one

        real_mp4 = tmp_path / "real_mp4"
        fake_mp4 = tmp_path / "fake_mp4"
        for d, base in ((real_mp4, 0), (fake_mp4, 100)):
            d.mkdir()
            # >= 10 fake clips: the video-IS protocol averages 10 splits
            for i in range(12):
                save_video(str(d / f"c{i}.mp4"), make_clip(base + i, 24, 32))
        real_fr, fake_fr = tmp_path / "real_fr", tmp_path / "fake_fr"
        for src, dst in ((real_mp4, real_fr), (fake_mp4, fake_fr)):
            for f in sorted(os.listdir(src)):
                convert_one(str(src / f), str(src), str(dst), None)
        return str(real_fr), str(fake_fr)

    def test_all_five_metrics_finite_and_cached(self, tmp_path):
        from latte_tpu.eval.detectors import standin_detector
        from latte_tpu.eval.metrics import calc_metric

        real, fake = self._make_dirs(tmp_path)
        det = standin_detector()
        cache = str(tmp_path / "cache")
        common = dict(
            real_path=real, fake_path=fake, detector=det,
            max_real=4, max_fake=4, cache_dir=cache, seed=0,
            report_dir=str(tmp_path / "report"),
        )
        vals = {}
        for name in (
            "fvd2048_16f", "fid50k_full", "kid50k_full", "is50k", "isv2048_ucf"
        ):
            opts = dict(common)
            if name.startswith("is"):
                # IS averages over 10 splits: needs >= 10 fake items
                opts["max_fake"] = 40
            res = calc_metric(name, num_frames=16, **opts)["results"]
            for k, v in res.items():
                assert np.isfinite(v), (name, res)
                vals[k] = v
        assert vals["fvd2048_16f"] > 0
        assert vals["is50k_mean"] >= 1.0  # IS on probabilities is >= 1
        # cache replay: bit-identical FVD from the stats pickle
        res2 = calc_metric("fvd2048_16f", num_frames=16, **common)["results"]
        assert res2["fvd2048_16f"] == vals["fvd2048_16f"]
        # JSONL report written (reference metric_main.py:81-91 semantics)
        report = os.path.join(str(tmp_path / "report"), "metric-fvd2048_16f.jsonl")
        assert len(open(report).readlines()) == 2

    def test_fvd_identical_protocol_is_zero(self, tmp_path):
        from latte_tpu.eval.detectors import i3d_features, standin_detector
        from latte_tpu.eval.metrics import _video_stats

        real, _ = self._make_dirs(tmp_path)
        det = standin_detector()
        kw = dict(num_frames=16, max_items=4, subsample_factor=1, seed=0)
        s1 = _video_stats(real, det, i3d_features, **kw)
        s2 = _video_stats(real, det, i3d_features, **kw)
        fd = frechet_distance(*s1.get_mean_cov(), *s2.get_mean_cov())
        assert fd < 1e-6, fd

    def test_standin_detector_semantics(self):
        from latte_tpu.eval.detectors import standin_detector

        det = standin_detector()
        vid = np.random.default_rng(0).integers(
            0, 255, size=(2, 3, 16, 32, 32)
        ).astype(np.float32)
        feats = det(vid, return_features=True)
        assert feats.shape == (2, 400) and np.abs(feats).max() <= 1.0
        # deterministic across constructions
        feats2 = standin_detector()(vid, return_features=True)
        np.testing.assert_array_equal(feats, feats2)
        # probability semantics for IS/C3D-style calls
        probs = det(vid, no_output_bias=True)
        np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)
        assert (probs >= 0).all()
        bare = det(vid)
        np.testing.assert_allclose(bare.sum(axis=1), 1.0, rtol=1e-5)
        # content-sensitive: temporally-reversed video gives other features
        rev = det(vid[:, :, ::-1], return_features=True)
        assert not np.allclose(feats, rev)

    def test_get_detector_dispatch(self):
        from latte_tpu.eval.detectors import get_detector, standin_detector

        d = get_detector("standin:7", "i3d")
        x = np.ones((1, 3, 8, 8, 8), np.float32) * 128
        np.testing.assert_array_equal(
            d(x, return_features=True),
            standin_detector(seed=7)(x, return_features=True),
        )
        with pytest.raises(FileNotFoundError):
            get_detector("auto", "i3d")  # no LATTE_TPU_DETECTORS set
