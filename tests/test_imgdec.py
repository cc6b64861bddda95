"""Native image decoder (native/imgdec.cc) + prefetch pipeline: PIL parity
across formats, threaded batch decode, failure masking, and the
PrefetchIterator / device_prefetch contracts."""

import numpy as np
import pytest

from v3d_tpu.native.imgdec import (
    decode_batch,
    decode_image,
    load_imgdec,
    load_rgba,
)

pytestmark = pytest.mark.skipif(load_imgdec() is None,
                                reason="native imgdec unavailable")


def _save(tmp_path, name, arr, mode, fmt=None, **kw):
    from PIL import Image

    p = str(tmp_path / name)
    Image.fromarray(arr, mode).save(p, format=fmt, **kw)
    return p


def test_png_rgba_parity(tmp_path):
    rng = np.random.RandomState(0)
    ref = rng.randint(0, 256, (21, 17, 4), dtype=np.uint8)
    p = _save(tmp_path, "a.png", ref, "RGBA")
    out = decode_image(p)
    np.testing.assert_array_equal(out, ref)


def test_png_rgb_and_gray(tmp_path):
    rng = np.random.RandomState(1)
    rgb = rng.randint(0, 256, (9, 11, 3), dtype=np.uint8)
    p = _save(tmp_path, "rgb.png", rgb, "RGB")
    out = decode_image(p)
    np.testing.assert_array_equal(out[..., :3], rgb)
    np.testing.assert_array_equal(out[..., 3], 255)

    gray = rng.randint(0, 256, (8, 6), dtype=np.uint8)
    p = _save(tmp_path, "g.png", gray, "L")
    out = decode_image(p)
    for c in range(3):
        np.testing.assert_array_equal(out[..., c], gray)


def test_jpeg_parity(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(2)
    # smooth image: JPEG is lossy, but the SAME decoder family (libjpeg)
    # backs PIL, so decode-of-identical-bytes should agree closely
    base = rng.randint(0, 200, (4, 4, 3), dtype=np.uint8)
    img = np.kron(base, np.ones((8, 8, 1))).astype(np.uint8)
    p = _save(tmp_path, "a.jpg", img, "RGB", quality=95)
    out = decode_image(p)
    ref = np.asarray(Image.open(p).convert("RGB"))
    assert out.shape == (32, 32, 4)
    np.testing.assert_allclose(out[..., :3].astype(int), ref.astype(int),
                               atol=2)
    np.testing.assert_array_equal(out[..., 3], 255)


def test_decode_image_from_bytes_and_garbage(tmp_path):
    rng = np.random.RandomState(3)
    ref = rng.randint(0, 256, (5, 7, 4), dtype=np.uint8)
    p = _save(tmp_path, "b.png", ref, "RGBA")
    with open(p, "rb") as f:
        data = f.read()
    np.testing.assert_array_equal(decode_image(data), ref)
    assert decode_image(b"not an image at all") is None
    assert decode_image(str(tmp_path / "missing.png")) is None


def test_decode_batch_threaded(tmp_path):
    rng = np.random.RandomState(4)
    paths, refs = [], []
    for i in range(8):
        ref = rng.randint(0, 256, (12, 10, 4), dtype=np.uint8)
        paths.append(_save(tmp_path, f"f{i}.png", ref, "RGBA"))
        refs.append(ref)
    out, ok = decode_batch(paths, (12, 10), threads=4)
    assert ok.all()
    np.testing.assert_array_equal(out, np.stack(refs))

    # failures are masked, not fatal: wrong size + missing file
    bad = _save(tmp_path, "wrong.png",
                np.zeros((3, 3, 4), np.uint8), "RGBA")
    out, ok = decode_batch([paths[0], bad, str(tmp_path / "nope.png")],
                           (12, 10), threads=2)
    assert ok.tolist() == [True, False, False]
    np.testing.assert_array_equal(out[0], refs[0])


def test_load_rgba_fallback_matches_pil(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(5)
    ref = rng.randint(0, 256, (6, 6, 4), dtype=np.uint8)
    p = _save(tmp_path, "c.png", ref, "RGBA")
    np.testing.assert_array_equal(
        load_rgba(p), np.asarray(Image.open(p).convert("RGBA")))


def test_orbit_decode_matches_pil(tmp_path):
    from PIL import Image

    from v3d_tpu.data.objaverse import _decode_orbit

    rng = np.random.RandomState(6)
    paths = []
    for i in range(3):
        arr = rng.randint(0, 256, (16, 16, 4), dtype=np.uint8)
        paths.append(_save(tmp_path, f"o{i}.png", arr, "RGBA"))
    out = _decode_orbit(paths)
    ref = np.stack([np.asarray(Image.open(p).convert("RGB"), np.float32)
                    for p in paths])
    np.testing.assert_array_equal(out, ref)


def test_prefetch_iterator():
    from v3d_tpu.data.prefetch import PrefetchIterator

    assert list(PrefetchIterator(range(7), depth=2)) == list(range(7))

    def boom():
        yield 1
        yield 2
        raise ValueError("producer died")

    it = PrefetchIterator(boom(), depth=1)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="producer died"):
        next(it)

    # early close doesn't hang even with a blocked producer
    it = PrefetchIterator(iter(range(1000)), depth=1)
    assert next(it) == 0
    it.close()


def test_device_prefetch_shards():
    import jax

    from v3d_tpu.data.prefetch import device_prefetch

    batches = [{"x": np.full((8, 2), i, np.float32)} for i in range(4)]
    out = list(device_prefetch(iter(batches)))
    assert len(out) == 4
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])
