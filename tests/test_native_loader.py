"""Native C++ image decoder: builds with g++, matches PIL bit-for-bit."""
import numpy as np
import pytest

from threedgrut_tpu.datasets.native_loader import ImageLoader, _pil_decode


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    from PIL import Image
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, mode in enumerate(("RGB", "RGBA", "L")):
        arr = (rng.uniform(size=(13, 17, {"RGB": 3, "RGBA": 4, "L": 1}[mode]))
               * 255).astype(np.uint8)
        img = Image.fromarray(arr.squeeze(), mode=mode)
        p = str(d / f"img_{i}.png")
        img.save(p)
        paths.append(p)
    jp = str(d / "img.jpg")
    Image.fromarray((rng.uniform(size=(13, 17, 3)) * 255)
                    .astype(np.uint8)).save(jp, quality=95)
    paths.append(jp)
    return paths


def test_native_builds_and_matches_pil(pngs):
    loader = ImageLoader(n_threads=2)
    assert loader.native, "native dataloader failed to build"
    for p in pngs[:3]:   # PNGs are lossless -> exact match
        a = loader.decode(p)
        b = _pil_decode(p)
        if b.ndim == 2:  # PIL grayscale -> native expands to RGB
            b = np.repeat(b[..., None], 3, -1)
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_native_jpeg(pngs):
    loader = ImageLoader(n_threads=2)
    a = loader.decode(pngs[-1])
    b = _pil_decode(pngs[-1])
    assert a.shape == b.shape
    assert np.abs(a - b).mean() < 0.02  # decoders may round differently


def test_prefetch_pipeline(pngs):
    loader = ImageLoader(n_threads=4)
    loader.prefetch(pngs[:3])
    for p in pngs[:3]:
        img = loader.get(p)
        assert img.ndim == 3 and img.dtype == np.float32
        assert 0.0 <= float(img.min()) and float(img.max()) <= 1.0
