"""Native (C++/libpng) IO runtime: codec roundtrips, PIL interop, the
parallel writer, and the PIL fallback path."""

import os

import numpy as np
import pytest
from PIL import Image

from vidseg_diffusion_tpu.io import native as nio


@pytest.fixture(scope="module")
def native_mod():
    return nio.load_native()


class TestCodec:
    def test_rgb_roundtrip_exact(self, tmp_path, native_mod):
        rng = np.random.RandomState(0)
        img = (rng.rand(37, 53, 3) * 255).astype(np.uint8)
        p = str(tmp_path / "a.png")
        nio.write_png(p, img)
        back = nio.read_png(p)
        np.testing.assert_array_equal(back, img)

    def test_gray_roundtrip(self, tmp_path):
        g = (np.arange(64 * 48) % 256).astype(np.uint8).reshape(64, 48)
        p = str(tmp_path / "g.png")
        nio.write_png(p, g)
        back = nio.read_png(p)
        np.testing.assert_array_equal(back[..., 0], g)

    def test_pil_interop_both_ways(self, tmp_path, native_mod):
        if native_mod is None:
            pytest.skip("native toolchain unavailable")
        rng = np.random.RandomState(1)
        img = (rng.rand(20, 30, 3) * 255).astype(np.uint8)
        # native write → PIL read
        p1 = str(tmp_path / "n.png")
        nio.write_png(p1, img)
        np.testing.assert_array_equal(np.asarray(Image.open(p1)), img)
        # PIL write → native read
        p2 = str(tmp_path / "p.png")
        Image.fromarray(img).save(p2)
        np.testing.assert_array_equal(nio.read_png(p2), img)

    def test_palette_png_decodes_to_rgb(self, tmp_path, native_mod):
        if native_mod is None:
            pytest.skip("native toolchain unavailable")
        img = Image.fromarray(
            (np.random.RandomState(2).rand(16, 16, 3) * 255).astype(np.uint8)
        ).convert("P")
        p = str(tmp_path / "pal.png")
        img.save(p)
        back = nio.read_png(p)
        np.testing.assert_array_equal(back, np.asarray(img.convert("RGB")))

    def test_decode_rejects_garbage(self, native_mod):
        if native_mod is None:
            pytest.skip("native toolchain unavailable")
        with pytest.raises(ValueError):
            native_mod.decode_png(b"not a png at all")


class TestParallelWriter:
    def test_writes_all(self, tmp_path):
        w = nio.ParallelFrameWriter(workers=3)
        imgs = [(np.full((8, 8, 3), i, np.uint8)) for i in range(12)]
        for i, im in enumerate(imgs):
            w.submit(str(tmp_path / f"f_{i}.png"), im)
        w.close()
        for i in range(12):
            back = nio.read_png(str(tmp_path / f"f_{i}.png"))
            np.testing.assert_array_equal(back, imgs[i])
