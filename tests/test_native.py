"""Native prefetcher: build, ordered delivery, parity with cv2."""

import os

import cv2
import numpy as np
import pytest

from orbslam3_byzyh_tpu import native


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(12):
        img = rng.integers(0, 255, (48, 64), dtype=np.uint8)
        p = str(d / f"{i:03d}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


class TestNativePrefetcher:
    def test_builds(self):
        lib = native.load()
        assert lib is not None, "native build failed (toolchain present?)"

    def test_ordered_and_matches_cv2(self, png_dir):
        pf = native.ImagePrefetcher(png_dir, n_threads=3, capacity=4)
        seen = []
        for idx, img in pf:
            ref = cv2.imread(png_dir[idx], cv2.IMREAD_GRAYSCALE).astype(np.float32)
            np.testing.assert_array_equal(img, ref)
            seen.append(idx)
        pf.close()
        assert seen == list(range(12))

    def test_single_thread(self, png_dir):
        pf = native.ImagePrefetcher(png_dir[:5], n_threads=1, capacity=2)
        assert [i for i, _ in pf] == list(range(5))
        pf.close()
