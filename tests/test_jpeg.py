"""Baseline JPEG codec tests: encoder↔decoder round trips (the only
honest verification available with no imaging library in-container),
subset rejection, and the Spark-side real decode/resize paths over
JPEG payloads."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from cassandra_extractor_spark.operators.jpegcodec import (
    AC_BITS,
    AC_VALS,
    DC_BITS,
    DC_VALS,
    ZIGZAG,
    _canonical_codes,
    decode_jpeg,
    encode_jpeg,
)


def _roundtrip(img: np.ndarray, **kw) -> np.ndarray:
    h, w, c = img.shape
    data = encode_jpeg(w, h, c, img.tobytes(), **kw)
    w2, h2, c2, px = decode_jpeg(data)
    assert (w2, h2, c2) == (w, h, c)
    return np.frombuffer(px, dtype=np.uint8).reshape(h, w, c)


def test_flat_images_survive_exactly():
    for shape, fill in (((16, 16, 1), 128), ((24, 40, 3), 77)):
        img = np.full(shape, fill, dtype=np.uint8)
        out = _roundtrip(img, quality=100)
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


def test_gradient_q100_within_dct_rounding():
    yy, xx = np.mgrid[0:21, 0:37]  # non-multiple-of-8 dims exercise edge padding
    img = np.stack([(xx * 5) % 256, (yy * 7) % 256, ((xx + yy) * 3) % 256], axis=2)
    img = np.ascontiguousarray(img).astype(np.uint8)
    out = _roundtrip(img, quality=100)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 3


def test_noise_q90_mean_error_bounded():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    out = _roundtrip(img, quality=90)
    assert float(np.abs(out.astype(int) - img.astype(int)).mean()) < 8.0


def test_subsampled_420_flat_chroma_lossless():
    img = np.full((24, 24, 3), (200, 30, 90), dtype=np.uint8)
    out = _roundtrip(img, quality=100, subsample=True)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


def test_restart_markers_resync():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    out = _roundtrip(img, quality=100, restart_interval=3)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 3


def test_grayscale_roundtrip():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (17, 19, 1), dtype=np.uint8)
    out = _roundtrip(img, quality=95)
    assert float(np.abs(out.astype(int) - img.astype(int)).mean()) < 6.0


def test_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")
    img = np.full((16, 16, 3), 10, dtype=np.uint8)
    data = encode_jpeg(16, 16, 3, img.tobytes())
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg(data[:40])


def test_truncated_scan_raises_valueerror_not_indexerror():
    """Entropy-coded data cut mid-scan must surface the module's
    promised 'rejected loudly' ValueError — never a raw IndexError
    from the bit reader running past the buffer."""
    img = (np.indices((32, 32)).sum(axis=0) % 97).astype(np.uint8)
    img = np.stack([img, img.T, 255 - img], axis=-1)
    data = encode_jpeg(32, 32, 3, img.tobytes())
    sos = data.find(b"\xff\xda")
    assert sos > 0
    # cut at several points inside the entropy-coded segment
    for cut in (sos + 20, sos + 40, len(data) - 8):
        with pytest.raises(ValueError, match="truncated"):
            decode_jpeg(data[:cut])


def test_multi_scan_baseline_rejected_loudly():
    """A 3-component frame whose SOS covers only 1 component (multi-
    scan non-interleaved baseline) must raise NotImplementedError,
    not return a 1-plane array that crashes in YCbCr conversion."""
    img = np.full((8, 8, 3), 90, dtype=np.uint8)
    data = bytearray(encode_jpeg(8, 8, 3, img.tobytes()))
    sos = data.find(b"\xff\xda")
    assert sos > 0
    # SOS segment: FF DA <len:2> <ns> <cs1 tt1> <cs2 tt2> <cs3 tt3> ...
    # rewrite to cover only the first component and shrink the length
    ln = (data[sos + 2] << 8) | data[sos + 3]
    ns = data[sos + 4]
    assert ns == 3
    tail_start = sos + 4 + 1 + 2 * ns  # Ss/Se/Ah-Al + entropy data
    new_seg = bytes(
        [0, 8, 1, data[sos + 5], data[sos + 6]]
    ) + bytes(data[tail_start : sos + 2 + ln])
    patched = bytes(data[: sos + 2]) + new_seg + bytes(data[sos + 2 + ln :])
    with pytest.raises(NotImplementedError, match="multi-scan"):
        decode_jpeg(patched)


def test_progressive_rejected_loudly():
    """A SOF2 frame header must raise NotImplementedError, not
    misdecode."""
    img = np.full((8, 8, 1), 50, dtype=np.uint8)
    data = bytearray(encode_jpeg(8, 8, 1, img.tobytes()))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(data))


def test_huffman_tables_are_valid_prefix_codes():
    """Spec-constant safety net: canonical code assignment must be
    prefix-free and complete for every (BITS, HUFFVAL) pair used."""
    for bits, vals in ((DC_BITS, DC_VALS), (AC_BITS, AC_VALS)):
        codes = _canonical_codes(bits, vals)
        assert len(codes) == len(vals)
        seen = set()
        for code, length in codes.values():
            bitstr = format(code, f"0{length}b")
            assert bitstr not in seen
            assert not any(bitstr.startswith(p) for p in seen if len(p) < length)
            seen.add(bitstr)
    assert len(ZIGZAG) == 64


def test_decode_images_real_jpeg_and_mixed_batch(spark):
    from cassandra_extractor_spark.operators.multimodal import decode_images

    rng = np.random.default_rng(9)
    jpg = encode_jpeg(
        48, 32, 3, rng.integers(0, 256, (32, 48, 3), dtype=np.uint8).tobytes()
    )
    import os

    fx = os.path.join(os.path.dirname(__file__), "fixtures")
    png = open(os.path.join(fx, "rgba_32x32.png"), "rb").read()
    df = spark.createDataFrame([Row(doc_id=1, payload=jpg), Row(doc_id=2, payload=png)])
    out = {
        r["doc_id"]: (r["width"], r["height"], r["channels"])
        for r in decode_images(df, "doc_id", "payload", real=True).collect()
    }
    assert out == {1: (48, 32, 3), 2: (32, 32, 4)}


def test_resize_images_real_jpeg_stays_jpeg(spark):
    from cassandra_extractor_spark.operators.multimodal import resize_images

    img = np.full((32, 48, 3), (10, 200, 60), dtype=np.uint8)
    jpg = encode_jpeg(48, 32, 3, img.tobytes(), quality=100)
    df = spark.createDataFrame([Row(doc_id=7, payload=jpg)])
    (row,) = resize_images(df, "doc_id", "payload", width=16, height=16, real=True).collect()
    resized = bytes(row["resized"])
    assert resized[:3] == b"\xff\xd8\xff"  # still a JPEG
    w, h, c, px = decode_jpeg(resized)
    assert (w, h, c) == (16, 16, 3)
    out = np.frombuffer(px, dtype=np.uint8).reshape(16, 16, 3)
    # flat image → resample + re-encode stays flat within codec error
    assert int(np.abs(out.astype(int) - np.array([10, 200, 60])).max()) <= 2


def test_dhash_cross_codec_and_neardup_pairs(spark):
    """The SAME image encoded as PNG and as JPEG must land within a
    small hamming distance (perceptual stability across codecs), a
    brightness-shifted copy must match closely (gradient-sign
    invariance), and an unrelated image must be far — then the banded
    hamming join finds exactly the near pairs."""
    from cassandra_extractor_spark.operators.multimodal import (
        dhash64,
        encode_png,
        image_dhash,
        image_neardup_pairs,
    )

    rng = np.random.default_rng(21)
    # smooth structured image (noise defeats any perceptual hash)
    yy, xx = np.mgrid[0:64, 0:64]
    base = (128 + 60 * np.sin(xx / 9.0) + 50 * np.cos(yy / 7.0)).clip(0, 255)
    img = np.stack([base, base * 0.8, base * 0.6], axis=2).astype(np.uint8)
    png = encode_png(64, 64, 3, img.tobytes())
    jpg = encode_jpeg(64, 64, 3, img.tobytes(), quality=90)
    brighter = np.clip(img.astype(int) + 25, 0, 255).astype(np.uint8)
    png_bright = encode_png(64, 64, 3, brighter.tobytes())
    other = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    png_other = encode_png(64, 64, 3, np.ascontiguousarray(other).tobytes())

    df = spark.createDataFrame(
        [
            Row(doc_id=1, payload=png),
            Row(doc_id=2, payload=jpg),
            Row(doc_id=3, payload=png_bright),
            Row(doc_id=4, payload=png_other),
        ]
    )
    hashes = image_dhash(df, "doc_id", "payload", real=True)
    pairs = {
        (r["d1"], r["d2"]): r["ham"]
        for r in image_neardup_pairs(hashes, max_ham=6).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in p for p in pairs)
    # signed-long round trip: hash with bit 63 set must survive Spark
    h = dhash64(2, 1, 1, bytes([255, 0]) )  # single gradient bit
    assert isinstance(h, int)


def test_tiny_image_dhash_no_nan_collapse():
    """Sub-9x8 images must hash via index upsampling, not NaN-collapse
    to 0 (review finding: zero-area box cells)."""
    import warnings

    from cassandra_extractor_spark.operators.multimodal import dhash64

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        a = dhash64(3, 2, 1, bytes([0, 128, 255, 255, 128, 0]))
        b = dhash64(3, 2, 1, bytes([255, 128, 0, 0, 128, 255]))
    assert a != b  # opposite gradients must differ, not both collapse


def test_cmyk_and_two_component_rejected():
    """nc not in (1,3) must reject loudly, never misdecode (review
    finding: CMYK silently went through YCbCr math)."""
    img = np.full((8, 8, 1), 50, dtype=np.uint8)
    data = bytearray(encode_jpeg(8, 8, 1, img.tobytes()))
    sof = data.find(b"\xff\xc0")
    # patch component count byte (SOF body: len(2) prec(1) h(2) w(2) nc(1))
    nc_off = sof + 2 + 2 + 1 + 2 + 2
    for bad_nc in (2, 4):
        patched = bytearray(data)
        patched[nc_off] = bad_nc
        with pytest.raises(NotImplementedError, match="components"):
            decode_jpeg(bytes(patched))


def test_grayscale_with_declared_sampling_factors_decodes_raster():
    """A single-component scan is raster 8x8 regardless of declared
    sampling factors (T.81 A.2) — patching h=v=2 into the SOF of a
    grayscale stream must not change the decoded pixels."""
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (24, 16, 1), dtype=np.uint8)
    data = bytearray(encode_jpeg(16, 24, 1, img.tobytes(), quality=100))
    sof = data.find(b"\xff\xc0")
    hv_off = sof + 2 + 2 + 1 + 2 + 2 + 1 + 1  # ... nc, comp_id, then h|v
    assert data[hv_off] == 0x11
    data[hv_off] = 0x22  # declare 2x2 sampling on the only component
    w, h, c, px = decode_jpeg(bytes(data))
    ref_w, ref_h, ref_c, ref_px = decode_jpeg(bytes(encode_jpeg(16, 24, 1, img.tobytes(), quality=100)))
    assert (w, h, c) == (ref_w, ref_h, ref_c) and px == ref_px
