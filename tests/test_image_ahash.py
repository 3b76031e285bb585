"""Pure-numpy pins for the aHash invariants b81_image_ahash_dedup's planted
oracle relies on: brightness-shift invariance (strictly monotone map, no
clipping), sensitivity to real content change, and codec-independence
(the same pattern through PPM and BMP hashes identically)."""

from __future__ import annotations

import numpy as np


from ps_datalake_spark.operators.multimodal import (
    _parse_bmp,
    _parse_ppm,
    ahash_int,
    encode_bmp,
    encode_ppm_pattern,
)


def test_brightness_shift_invariance_every_id():
    for pid in range(25):
        base = _parse_ppm(encode_ppm_pattern(16, 16, pid))
        for shift in (1, 25, 50, 55):
            shifted = _parse_ppm(encode_ppm_pattern(16, 16, pid, shift=shift))
            assert ahash_int(base) == ahash_int(shifted), (pid, shift)


def test_distinct_patterns_distinct_hashes():
    hashes = {ahash_int(_parse_ppm(encode_ppm_pattern(16, 16, i))) for i in range(50)}
    # modular-wrap patterns must not collapse; allow a rare 64-bit collision
    assert len(hashes) >= 49


def test_content_change_flips_hash():
    base = _parse_ppm(encode_ppm_pattern(16, 16, 7))
    mod = base.copy()
    mod[0:2, 0:2, :] = 255
    assert ahash_int(mod) != ahash_int(base)


def test_codec_independent():
    """The hash is over DECODED pixels: the same two-band image through the
    PPM and BMP codecs (bottom-up rows, BGR, padding) must hash equal."""
    ppm_img = _parse_ppm(
        b"P6\n16 16\n255\n"
        + np.vstack(
            [np.full((8, 16, 3), 40, np.uint8), np.full((8, 16, 3), 200, np.uint8)]
        ).tobytes()
    )
    bmp_img = _parse_bmp(encode_bmp(16, 16, (40, 40, 40), (200, 200, 200)))
    assert ahash_int(ppm_img) == ahash_int(bmp_img)


def test_shift_bound_arithmetic():
    """The +shift guarantee depends on NO uint8 wrap: base values span
    [0, 200], so the documented bound shift<=55 tops out at exactly 255.
    A wrap (e.g. value 200 at shift 56 -> 0) would break the monotone-map
    premise behind the planted oracle — pin the boundary."""
    assert (np.arange(201) + 55).max() == 255
    assert np.uint8(200 + 56) == 0  # one past the bound wraps


def test_wrap_breaks_invariance_when_it_hits_a_block():
    """Demonstrate WHY the bound matters: force a wrap on a bright block
    (set a 2x2 corner to 255, then +1 with uint8 wrap -> 0) — the block
    falls below the mean and the hash changes."""
    base = _parse_ppm(encode_ppm_pattern(16, 16, 3))
    bright = base.copy()
    bright[0:2, 0:2, :] = 255
    wrapped = bright.copy()
    wrapped[0:2, 0:2, :] = np.uint8(255 + 1)  # the wrap a shift>55 would cause
    assert ahash_int(bright) != ahash_int(wrapped)
