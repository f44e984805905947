"""Baseline JPEG codec tests (dmid_spark.multimodal.jpeg).

Round-trip is a meaningful gate here because the two directions share only
the spec constants: the encoder quantizes real DCT coefficients and packs
canonical Huffman codes; the decoder re-derives its tables from the file's
DQT/DHT segments and must recover the *exact* quantized coefficients for
pixels to land within the quantization error bound. The zigzag table —
the one constant where a shared bug could cancel — is asserted against the
literal ITU-T T.81 Fig. 5 ordering typed out independently below.
"""

import numpy as np
import pytest

from dmid_spark.multimodal import codecs, jpeg

# ITU-T T.81 Figure 5, typed from the spec (raster index of each zigzag slot)
_SPEC_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    err = (a.astype(np.float64) - b.astype(np.float64)) ** 2
    return 10 * np.log10(255.0**2 / max(err.mean(), 1e-12))


def test_zigzag_matches_spec_literal():
    assert list(jpeg._ZZ) == _SPEC_ZIGZAG


def test_dct_matrix_is_orthonormal_and_matches_fft_reference():
    c = jpeg._dct_matrix()
    assert np.allclose(c @ c.T, np.eye(8), atol=1e-12)
    # independent DCT-II reference via FFT of the mirrored sequence:
    # raw DCT-II sum = Re(e^{-iπk/2N} · FFT([x, x reversed])[k]) / 2
    x = np.arange(8, dtype=np.float64) ** 1.5 + 3
    spec = np.fft.fft(np.concatenate([x, x[::-1]]))[:8]
    k = np.arange(8)
    raw = 0.5 * (np.exp(-1j * np.pi * k / 16) * spec).real
    alpha = np.full(8, np.sqrt(2.0 / 8.0))
    alpha[0] = np.sqrt(1.0 / 8.0)
    assert np.allclose(c @ x, alpha * raw, atol=1e-10)


def test_quality_100_roundtrip_is_near_lossless():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=100))
    assert dec.shape == img.shape
    # all quant steps are 1 at q=100: loss is DCT + color-transform rounding
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3


def test_gray_roundtrip():
    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, size=(19, 21), dtype=np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=100))
    assert dec.shape == (19, 21, 1)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 2


@pytest.mark.parametrize("subsampling", ["4:4:4", "4:2:2", "4:2:0"])
def test_subsampled_roundtrip_on_smooth_gradient(subsampling):
    yy, xx = np.mgrid[0:37, 0:23]  # odd dims stress MCU padding + crop
    grad = np.stack(
        [(yy * 3 + xx * 2) % 256, (yy * 5) % 256, (xx * 7) % 256], axis=2
    ).astype(np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(grad, quality=90, subsampling=subsampling))
    assert dec.shape == grad.shape
    assert _psnr(dec, grad) > 35.0


def test_restart_intervals_decode_identically():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(33, 40, 3), dtype=np.uint8)
    plain = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=80))
    with_rst = jpeg.encode_jpeg(img, quality=80, restart_interval=2)
    assert b"\xff\xd0" in with_rst or b"\xff\xd1" in with_rst
    assert np.array_equal(jpeg.decode_jpeg(with_rst), plain)
    # and with subsampling (multi-block MCUs cross restart boundaries)
    p420 = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=80, subsampling="4:2:0"))
    r420 = jpeg.encode_jpeg(img, quality=80, subsampling="4:2:0", restart_interval=1)
    assert np.array_equal(jpeg.decode_jpeg(r420), p420)


def test_quality_trades_size_for_fidelity():
    yy, xx = np.mgrid[0:32, 0:32]
    img = np.stack([(yy * 4) % 256, (xx * 4) % 256, ((yy + xx) * 2) % 256], axis=2).astype(
        np.uint8
    )
    lo, hi = jpeg.encode_jpeg(img, quality=20), jpeg.encode_jpeg(img, quality=95)
    assert len(lo) < len(hi)
    assert _psnr(jpeg.decode_jpeg(hi), img) > _psnr(jpeg.decode_jpeg(lo), img)


def test_unsupported_variants_raise_cleanly():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    enc = bytearray(jpeg.encode_jpeg(img))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="progressive"):
        jpeg.decode_jpeg(bytes(enc))
    with pytest.raises(ValueError, match="not a JPEG"):
        jpeg.decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        jpeg.encode_jpeg(np.zeros((8, 8, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="subsampling"):
        jpeg.encode_jpeg(img, subsampling="4:1:1")


def test_dispatch_and_sniff():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    enc = jpeg.encode_jpeg(img, quality=100)
    assert codecs.sniff(enc) == "jpeg"
    got = codecs.decode_image_payload(enc)
    assert got.shape == (16, 24, 3)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 3


def test_media_table_jpeg_rows_decode_end_to_end(spark):
    from dmid_spark.multimodal import decode_image, synth_media_table

    media = synth_media_table(spark, n=48, payload="encoded")
    rows = decode_image(media, impl="real").collect()
    assert rows
    kinds = {
        r.media_id: codecs.sniff(bytes(r.payload))
        for r in media.filter("kind = 'image'").collect()
    }
    assert "jpeg" in set(kinds.values())  # the %3 rotation reaches JPEG rows
    for r in rows:
        assert r.channels == 3 and len(r.pixels) == r.width * r.height * 3
