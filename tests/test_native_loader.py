"""Native C++ JPEG loader tests: build, decode correctness vs cv2, threading."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from humaniflow_tpu.data.native_loader import (
    PrefetchingLoader,
    decode_jpeg_batch,
    native_available,
)


@pytest.fixture(scope="module")
def jpeg_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(64, 48), (128, 128), (37, 91)]):
        # smooth images so JPEG loss + resampler differences stay small
        yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
        img = np.stack([xx, yy, 0.5 * (xx + yy)], -1)
        img = (img * 255).astype(np.uint8)
        p = str(d / f"img_{i}.jpg")
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR), [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(p)
    return paths


def test_native_builds():
    assert native_available(), "native dataloader failed to build/load"


def test_decode_matches_cv2(jpeg_files):
    out = decode_jpeg_batch(jpeg_files, 32, num_threads=3)
    assert out.shape == (3, 32, 32, 3)
    assert out.dtype == np.float32
    for i, p in enumerate(jpeg_files):
        ref = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        ref = cv2.resize(ref, (32, 32), interpolation=cv2.INTER_LINEAR) / 255.0
        # different-but-equivalent bilinear implementations + JPEG decode
        # rounding: require close agreement, not bit equality
        assert np.abs(out[i] - ref).mean() < 0.02
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_bad_path_zero_filled(jpeg_files):
    out = decode_jpeg_batch([jpeg_files[0], "/nonexistent/x.jpg"], 16)
    assert out[0].max() > 0
    assert out[1].max() == 0.0


def test_prefetching_loader():
    made = []

    def make(i):
        made.append(i)
        return {"i": i}

    batches = list(PrefetchingLoader(make, 5))
    assert [b["i"] for b in batches] == [0, 1, 2, 3, 4]
    assert made == [0, 1, 2, 3, 4]
