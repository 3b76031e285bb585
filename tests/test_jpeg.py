"""Baseline JPEG codec (operators/jpeg.py): pure-function tests, no Spark."""

from __future__ import annotations

import math

import numpy as np
import pytest

from ps_datalake_spark.operators import jpeg as J


def _rr(x: float) -> int:
    return math.floor(x + 0.5 + 1e-6)


def _clamp(v: float) -> int:
    return min(255, max(0, v))


def analytic_uniform(rgb, quality):
    """The closed-form DC-only round-trip any correct baseline codec must
    produce for a block-aligned uniform color (module docstring)."""
    lum, chr_ = J.quality_tables(quality)
    qs = (int(lum[0]), int(chr_[0]), int(chr_[0]))
    r, g, b = rgb
    y = _clamp(_rr(0.299 * r + 0.587 * g + 0.114 * b))
    cb = _clamp(_rr(-0.168736 * r - 0.331264 * g + 0.5 * b + 128))
    cr = _clamp(_rr(0.5 * r - 0.418688 * g - 0.081312 * b + 128))
    y2, cb2, cr2 = (
        _clamp(_rr(_rr(8 * (v - 128) / q) * q / 8.0 + 128)) for v, q in zip((y, cb, cr), qs)
    )
    return (
        _clamp(_rr(y2 + 1.402 * (cr2 - 128))),
        _clamp(_rr(y2 - 0.344136 * (cb2 - 128) - 0.714136 * (cr2 - 128))),
        _clamp(_rr(y2 + 1.772 * (cb2 - 128))),
    )


@pytest.mark.parametrize("quality", [35, 50, 75, 90, 100])
@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_uniform_roundtrip_matches_analytic_form(quality, subsampling):
    for rgb in [(200, 30, 60), (0, 0, 0), (255, 255, 255), (17, 123, 240)]:
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        img[:, :] = rgb
        dec = J.parse_jpeg(J.encode_jpeg(img, quality=quality, subsampling=subsampling))
        assert dec.shape == (16, 16, 3)
        assert (dec == dec[0, 0]).all(), "uniform input must decode uniform"
        assert tuple(int(v) for v in dec[0, 0]) == analytic_uniform(rgb, quality)


def test_two_band_image_bands_stay_uniform():
    img = np.zeros((32, 24, 3), dtype=np.uint8)
    img[:16] = (200, 30, 60)
    img[16:] = (10, 220, 90)
    for sub in ("444", "420"):
        dec = J.parse_jpeg(J.encode_jpeg(img, quality=75, subsampling=sub))
        assert (dec[:16] == dec[0, 0]).all() and (dec[16:] == dec[31, 0]).all()
        assert tuple(int(v) for v in dec[0, 0]) == analytic_uniform((200, 30, 60), 75)
        assert tuple(int(v) for v in dec[31, 0]) == analytic_uniform((10, 220, 90), 75)


def test_gradient_roundtrip_high_quality_psnr():
    """Non-uniform content exercises AC coefficients end-to-end (Huffman AC
    run-length, ZRL, EOB, dequant, full IDCT). q=95 must round-trip a smooth
    gradient above 40 dB PSNR — a decoder with any coefficient-order or
    unzigzag bug lands an order of magnitude below that."""
    x = np.linspace(0, 255, 48).astype(np.uint8)
    img = np.stack([np.tile(x, (40, 1))] * 3, axis=-1)
    img[:, :, 1] = img[:, :, 1][::-1]
    dec = J.parse_jpeg(J.encode_jpeg(img, quality=95, subsampling="444"))
    mse = ((dec.astype(float) - img.astype(float)) ** 2).mean()
    psnr = 10 * np.log10(255**2 / max(mse, 1e-9))
    assert psnr > 40.0, f"PSNR {psnr:.1f} dB"


def test_restart_markers_do_not_change_pixels():
    x = np.linspace(0, 255, 48).astype(np.uint8)
    img = np.stack([np.tile(x, (40, 1))] * 3, axis=-1)
    base = J.parse_jpeg(J.encode_jpeg(img, quality=95))
    rst = J.parse_jpeg(J.encode_jpeg(img, quality=95, restart_interval=3))
    assert (base == rst).all()


def test_odd_dimensions_pad_and_crop():
    img = np.zeros((13, 19, 3), dtype=np.uint8)
    img[:, :] = (99, 150, 201)
    for sub in ("444", "420"):
        dec = J.parse_jpeg(J.encode_jpeg(img, quality=85, subsampling=sub))
        assert dec.shape == (13, 19, 3)
        assert (dec == dec[0, 0]).all()
        assert tuple(int(v) for v in dec[0, 0]) == analytic_uniform((99, 150, 201), 85)


def test_decoder_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        J.parse_jpeg(b"\x00\x01not a jpeg")
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:, :] = (40, 80, 120)
    raw = J.encode_jpeg(img, quality=75)
    with pytest.raises(ValueError):
        J.parse_jpeg(raw[: len(raw) // 2])  # entropy data cut mid-MCU


def test_quality_tables_ijg_formula():
    lum50, chr50 = J.quality_tables(50)
    assert (lum50 == J.STD_LUM_QT).all() and (chr50 == J.STD_CHR_QT).all()
    lum90, _ = J.quality_tables(90)
    assert (lum90 == np.clip((J.STD_LUM_QT * 20 + 50) // 100, 1, 255)).all()
    lum100, _ = J.quality_tables(100)
    assert (lum100 == 1).all()  # scale 0 clips every entry to 1


def test_fill_bytes_before_markers_are_skipped():
    """Optional 0xFF fill bytes before a marker are legal (T.81 B.1.1.2)."""
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:, :] = (40, 80, 120)
    raw = J.encode_jpeg(img, quality=75)
    # inject a fill byte before the DQT marker (first FF DB occurrence)
    i = raw.index(b"\xff\xdb")
    padded = raw[:i] + b"\xff" + raw[i:]
    assert (J.parse_jpeg(padded) == J.parse_jpeg(raw)).all()


def test_truncation_after_ff_byte_raises_value_error():
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:, :] = (40, 80, 120)
    raw = J.encode_jpeg(img, quality=75)
    # cut immediately after every FF in the entropy segment tail: must raise
    # the documented ValueError, never IndexError
    sos = raw.index(b"\xff\xda")
    for i in range(sos, len(raw)):
        if raw[i] == 0xFF:
            with pytest.raises(ValueError):
                J.parse_jpeg(raw[: i + 1])
            break


def test_stray_restart_marker_raises_value_error():
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:, :] = (40, 80, 120)
    raw = bytearray(J.encode_jpeg(img, quality=75))
    # plant FF D3 a few bytes into the entropy-coded data (no DRI declared)
    sos = bytes(raw).index(b"\xff\xda")
    inject = sos + 14
    raw[inject : inject] = b"\xff\xd3"
    with pytest.raises(ValueError):
        J.parse_jpeg(bytes(raw))
