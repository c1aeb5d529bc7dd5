"""Tests for the native C++ loader (decode + crop + resize, parallel gather)."""

import numpy as np
import pytest

from blurred_gan_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native loader unavailable: {native.build_error()}")


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = []
    for i, (w, h, fmt) in enumerate([(80, 60, "JPEG"), (60, 80, "JPEG"),
                                     (64, 64, "PNG"), (100, 40, "PNG")]):
        arr = rng.randint(0, 255, (h, w, 3), np.uint8)
        p = d / f"img{i}.{'jpg' if fmt == 'JPEG' else 'png'}"
        Image.fromarray(arr).save(p, fmt, quality=95)
        paths.append(str(p))
    return paths


class TestDecodeBatch:
    def test_shapes(self, image_dir):
        out = native.decode_batch(image_dir, 32)
        assert out.shape == (4, 32, 32, 3) and out.dtype == np.uint8

    def test_matches_pil_path(self, image_dir):
        from PIL import Image

        got = native.decode_batch(image_dir, 32)
        for i, p in enumerate(image_dir):
            img = Image.open(p).convert("RGB")
            w, h = img.size
            side = min(w, h)
            img = img.crop(((w - side) // 2, (h - side) // 2,
                            (w + side) // 2, (h + side) // 2))
            img = img.resize((32, 32), Image.BILINEAR)
            want = np.asarray(img, np.uint8)
            # Same decoder family (libjpeg) + same half-pixel bilinear;
            # rounding may differ by 1-2 LSB per channel.
            diff = np.abs(got[i].astype(int) - want.astype(int))
            assert diff.mean() < 1.5, f"image {i}: mean |diff|={diff.mean()}"
            assert np.percentile(diff, 99) <= 3

    def test_png_lossless_at_native_res(self, tmp_path):
        # Square PNG at the target resolution: decode must be bit-exact
        # (no resampling happens).
        from PIL import Image

        rng = np.random.RandomState(1)
        arr = rng.randint(0, 255, (32, 32, 3), np.uint8)
        p = tmp_path / "x.png"
        Image.fromarray(arr).save(p)
        out = native.decode_batch([str(p)], 32)
        np.testing.assert_array_equal(out[0], arr)

    def test_bad_file_raises(self, tmp_path):
        p = tmp_path / "junk.jpg"
        p.write_bytes(b"not an image")
        with pytest.raises(IOError):
            native.decode_batch([str(p)], 32)


class TestGatherBatch:
    def test_matches_fancy_indexing(self):
        rng = np.random.RandomState(2)
        src = rng.randint(0, 255, (100, 16, 16, 3), np.uint8)
        idx = rng.permutation(100)[:32]
        got = native.gather_batch(src, idx)
        np.testing.assert_array_equal(got, src[idx])
