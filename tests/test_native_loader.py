"""Native C++ loader: build, decode correctness vs PIL, threaded batch."""
import numpy as np
import pytest
from PIL import Image

from fenerf_tpu.data import native_loader as nl


@pytest.fixture(scope="module")
def imgs(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    # smooth image (jpeg is lossy; gradients compress predictably)
    yy, xx = np.mgrid[0:400, 0:520]
    img = np.stack([xx % 256, yy % 256, (xx + yy) % 256], -1).astype(np.uint8)
    jpg = str(d / "a.jpg")
    Image.fromarray(img).save(jpg, quality=95)
    mask = (rng.randint(0, 19, (400, 520))).astype(np.uint8)
    png = str(d / "m.png")
    Image.fromarray(mask, mode="L").save(png)
    return jpg, png


needs_native = pytest.mark.skipif(not nl.available(),
                                  reason="native toolchain unavailable")


@needs_native
class TestNativeLoader:
    def test_jpeg_bilinear_close_to_pil(self, imgs):
        jpg, _ = imgs
        out = nl.preprocess(jpg, 64, nearest=False, gray=False)
        assert out.shape == (64, 64, 3)
        # PIL reference path (dataset geometry)
        pil = Image.open(jpg).convert("RGB")
        w, h = pil.size
        s = 320 / min(w, h)
        pil = pil.resize((round(w * s), round(h * s)), Image.BILINEAR)
        w, h = pil.size
        left, top = (w - 256) // 2, (h - 256) // 2
        pil = pil.crop((left, top, left + 256, top + 256)).resize(
            (64, 64), Image.BILINEAR)
        ref = np.asarray(pil)
        diff = np.abs(out.astype(int) - ref.astype(int))
        assert diff.mean() < 3.0, diff.mean()
        assert np.percentile(diff, 99) <= 12

    def test_png_nearest_mask_values(self, imgs):
        _, png = imgs
        out = nl.preprocess(png, 32, nearest=True, gray=True)
        assert out.shape == (32, 32, 1)
        assert out.max() <= 18  # only valid class ids survive NEAREST

    def test_batch_matches_single(self, imgs):
        jpg, png = imgs
        batch = nl.preprocess_batch([jpg, jpg], 48, nearest=False)
        single = nl.preprocess(jpg, 48, nearest=False)
        assert batch.shape == (2, 48, 48, 3)
        np.testing.assert_array_equal(batch[0], single)
        np.testing.assert_array_equal(batch[1], single)

    def test_missing_file_raises(self):
        with pytest.raises(IOError):
            nl.preprocess("/nonexistent/x.jpg", 32)


@needs_native
class TestNativePairPath:
    def test_pair_matches_pil_dataset(self, tmp_path):
        from fenerf_tpu.data.celeba_mask import CelebAMaskDataset

        (tmp_path / "celebahq_mask_img").mkdir()
        (tmp_path / "celebahq_mask_mask").mkdir()
        yy, xx = np.mgrid[0:512, 0:512]
        img = np.stack([xx % 256, yy % 256, 128 + 0 * xx], -1).astype(np.uint8)
        Image.fromarray(img).save(
            str(tmp_path / "celebahq_mask_img" / "0.jpg"), quality=95)
        mask = np.where(xx < 256, 0, (yy // 64) % 18 + 1).astype(np.uint8)
        Image.fromarray(mask, mode="L").save(
            str(tmp_path / "celebahq_mask_mask" / "0.png"))

        ds_pil = CelebAMaskDataset(str(tmp_path), 64, use_native=False)
        ds_nat = CelebAMaskDataset(str(tmp_path), 64, use_native=True)
        xp, lp = ds_pil[0]
        xn, ln = ds_nat[0]
        assert xn.shape == xp.shape and ln.shape == lp.shape
        # masks NEAREST: identical one-hot labels
        np.testing.assert_array_equal(ln, lp)
        # images: resampler families differ slightly
        assert np.abs(xn - xp).mean() < 0.03

    def test_pair_batch(self, imgs):
        from fenerf_tpu.data import native_loader as nl2
        jpg, png = imgs
        ims, masks = nl2.preprocess_pair_batch([jpg, jpg], [png, png], 32,
                                               background_mask=True)
        assert ims.shape == (2, 32, 32, 3) and masks.shape == (2, 32, 32)
        np.testing.assert_array_equal(ims[0], ims[1])
