"""Data-pipeline fidelity tests: per-dataset transform stacks must match
the reference table (`/root/reference/datasets/__init__.py:13-79`):
ffs/ucf101 flip + UCF scale-then-crop; taichi flip only; sky
crop-then-resize without flip."""

import os
import random
import types

import numpy as np
import pytest

from latte_tpu.data import video_transforms as vt
from latte_tpu.data.datasets import get_dataset


def grad_video(F=2, H=8, W=16):
    """Deterministic uint8 gradient: pixel value encodes (h, w)."""
    v = np.zeros((F, H, W, 3), np.uint8)
    for h in range(H):
        for w in range(W):
            v[:, h, w] = (h * 10 + w) % 256
    return v


def norm(v):
    return vt.normalize_video(vt.to_tensor_video(v))


class TestTransformPrimitives:
    def test_ucf_center_crop_hand_computed(self):
        """(8, 16) -> scale shorter side to 4 -> (4, 8) -> center crop 4:
        columns 2:6 of the scaled frame."""
        v = grad_video()
        out = vt.ucf_center_crop(v, 4)
        assert out.shape == (2, 4, 4, 3)
        scaled = vt.resize(v, (4, 8))
        np.testing.assert_array_equal(out, scaled[:, :, 2:6])

    def test_center_crop_resize_hand_computed(self):
        """(8, 16) -> center crop largest square (8, 8) cols 4:12 ->
        resize to (4, 4)."""
        v = grad_video()
        out = vt.center_crop_resize(v, 4)
        assert out.shape == (2, 4, 4, 3)
        cropped = v[:, :, 4:12]
        np.testing.assert_allclose(out, vt.resize(cropped, (4, 4)), atol=1e-5)

    def test_resize_scale_floor_semantics(self):
        """Output dims are floor(H * scale), shorter side lands exactly."""
        v = np.zeros((1, 100, 301, 3), np.uint8)
        out = vt.resize_scale(v, 64)
        assert out.shape[1] == 64
        assert out.shape[2] == int(301 * 64 / 100)  # floor, not round

    def test_resize_scale_fp_rounding_never_undershoots(self):
        """~12% of shorter-side values make floor(min*(t/min)) land on
        t-1 via fp rounding (e.g. 347/389/394 @ 256) — the shorter side
        must be pinned to the target or the center crop crashes."""
        for short in (347, 389, 394, 255, 1000):
            v = np.zeros((1, short, short + 57, 3), np.uint8)
            out = vt.resize_scale(v, 256)
            assert out.shape[1] == 256, short
            assert out.shape[2] >= 256
            cropped = vt.ucf_center_crop(v, 256)  # must not assert
            assert cropped.shape[1:3] == (256, 256)

    def test_resize_interpolates_in_float(self):
        """No uint8 quantization: a 2-pixel [0, 1] edge resized up must
        produce fractional values."""
        v = np.zeros((1, 2, 2, 3), np.uint8)
        v[:, :, 1] = 1
        out = vt.resize(v, (2, 4))
        assert out.dtype == np.float32
        assert ((out > 0) & (out < 1)).any()

    def test_flip_rng_seeded(self):
        v = grad_video()
        # Random(1).random() = 0.134... < 0.5 -> flip
        flipped = vt.random_horizontal_flip(v, rng=random.Random(1))
        np.testing.assert_array_equal(flipped, v[:, :, ::-1])
        # Random(0).random() = 0.844... >= 0.5 -> no flip
        same = vt.random_horizontal_flip(v, rng=random.Random(0))
        np.testing.assert_array_equal(same, v)

    def test_temporal_crop_reference_range(self):
        """Reference draws begin from [0, total - size - 1]."""
        tc = vt.TemporalRandomCrop(10)
        begins = {tc(20, random.Random(s))[0] for s in range(500)}
        assert max(begins) == 9  # 20 - 10 - 1
        assert min(begins) == 0
        b, e = tc(10, random.Random(0))
        assert (b, e) == (0, 10)


class TestReferenceTransformStacks:
    def test_ffs_ucf101_stack(self):
        v = grad_video()
        for name in ("ffs", "ucf101", "ffs_img", "ucf101_img"):
            t = vt.make_reference_transform(name, 4)
            out = t(v, random.Random(1))  # flip draw fires
            expected = norm(vt.ucf_center_crop(v[:, :, ::-1], 4))
            np.testing.assert_allclose(out, expected, atol=1e-6)
            out_noflip = t(v, random.Random(0))
            np.testing.assert_allclose(
                out_noflip, norm(vt.ucf_center_crop(v, 4)), atol=1e-6
            )

    def test_taichi_stack_no_crop(self):
        v = grad_video()
        t = vt.make_reference_transform("taichi", 4)
        out = t(v, random.Random(1))
        # flip only: spatial dims preserved, NO crop applied
        assert out.shape == (2, 3, 8, 16)
        np.testing.assert_allclose(out, norm(v[:, :, ::-1].copy()), atol=1e-6)

    def test_sky_stack_no_flip(self):
        v = grad_video()
        t = vt.make_reference_transform("sky", 4)
        # rng that would flip elsewhere must have no effect for sky
        out = t(v, random.Random(1))
        np.testing.assert_allclose(out, norm(vt.center_crop_resize(v, 4)), atol=1e-6)

    def test_unknown_dataset_raises(self):
        with pytest.raises(NotImplementedError):
            vt.make_reference_transform("kinetics", 4)


def _write_frame_folder(root, n_clips=2, n_frames=8, hw=(12, 12)):
    import cv2

    for c in range(n_clips):
        d = os.path.join(root, f"clip{c}")
        os.makedirs(d, exist_ok=True)
        for f in range(n_frames):
            img = np.full((*hw, 3), (c * 50 + f) % 255, np.uint8)
            cv2.imwrite(os.path.join(d, f"{f:03d}.png"), img)


class TestGetDatasetTransformWiring:
    def test_taichi_keeps_native_resolution(self, tmp_path):
        _write_frame_folder(str(tmp_path), hw=(12, 18))
        args = types.SimpleNamespace(
            dataset="taichi", data_path=str(tmp_path), num_frames=4,
            frame_interval=1, image_size=8,
        )
        item = get_dataset(args)[0]
        # reference taichi applies NO spatial transform
        assert item["video"].shape == (4, 3, 12, 18)

    def test_sky_resizes_no_flip(self, tmp_path):
        _write_frame_folder(str(tmp_path), hw=(12, 18))
        args = types.SimpleNamespace(
            dataset="sky", data_path=str(tmp_path), num_frames=4,
            frame_interval=1, image_size=8,
        )
        item = get_dataset(args)[0]
        assert item["video"].shape == (4, 3, 8, 8)

    def test_ffs_ucf_crop_shape(self, tmp_path):
        from latte_tpu.utils import save_video

        d = tmp_path / "vids"
        d.mkdir()
        v = (np.random.default_rng(0).random((12, 16, 24, 3)) * 255).astype(np.uint8)
        save_video(str(d / "a.mp4"), v, fps=8)
        args = types.SimpleNamespace(
            dataset="ffs", data_path=str(d), num_frames=4,
            frame_interval=1, image_size=8,
        )
        item = get_dataset(args)[0]
        assert item["video"].shape == (4, 3, 8, 8)
        assert item["video"].min() >= -1.0 and item["video"].max() <= 1.0


class TestUint8Transport:
    """uint8 pixel transport (data/loader.py quantize_video_u8): 4x less
    host->device traffic, dequantized on device in the fused train step."""

    def test_roundtrip_lossless_on_uint8_grid(self):
        from latte_tpu.data.loader import quantize_video_u8

        # source pixels v -> v/127.5 - 1 (to_tensor+normalize of uint8)
        v = np.arange(256, dtype=np.uint8).reshape(1, 16, 16, 1)
        v = np.broadcast_to(v, (4, 16, 16, 4)).copy()
        norm = v.astype(np.float32) / 127.5 - 1.0
        assert np.array_equal(quantize_video_u8(norm), v)

    def test_roundtrip_error_bound_arbitrary(self):
        from latte_tpu.data.loader import quantize_video_u8

        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, size=(2, 3, 32, 32)).astype(np.float32)
        q = quantize_video_u8(x)
        back = q.astype(np.float32) / 127.5 - 1.0
        assert np.abs(back - x).max() <= 0.5 / 127.5 + 1e-6

    def test_loader_ships_uint8(self, tmp_path):
        import types

        from latte_tpu.data import DataLoader, get_dataset
        from latte_tpu.utils import save_video

        d = tmp_path / "vids"
        d.mkdir()
        v = (np.random.default_rng(0).random((12, 16, 24, 3)) * 255).astype(np.uint8)
        save_video(str(d / "a.mp4"), v, fps=8)
        args = types.SimpleNamespace(
            dataset="ffs", data_path=str(d), num_frames=4,
            frame_interval=1, image_size=8,
        )
        loader = DataLoader(get_dataset(args), batch_size=1, num_workers=1,
                            pixel_uint8=True)
        it = iter(loader)
        batch = next(it)
        loader.close()
        assert batch["video"].dtype == np.uint8
        assert batch["video"].shape == (1, 4, 3, 8, 8)
