"""MP4/ISO-BMFF container metadata parsing: the test hand-assembles a
minimal-but-valid box tree from the public spec (ftyp + moov{mvhd,
trak{tkhd, mdia{hdlr, minf{stbl{stsd}}}}}) and asserts the parser
recovers every field — real structural parsing, no codec involved."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import Row

from cassandra_extractor_spark.operators.multimodal import (
    extract_video_meta,
    parse_mp4_meta,
)


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _make_mp4(
    timescale=1000, duration=12_500, width=640, height=360, codec=b"avc1", version=0
) -> bytes:
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    if version == 1:
        mvhd = _box(
            b"mvhd",
            b"\x01" + b"\x00" * 3  # version 1 + flags
            + struct.pack(">QQIQ", 0, 0, timescale, duration)
            + b"\x00" * 80,
        )
    else:
        mvhd = _box(
            b"mvhd",
            b"\x00" * 4 + struct.pack(">IIII", 0, 0, timescale, duration) + b"\x00" * 80,
        )
    # tkhd v0: ver/flags(4) c_time(4) m_time(4) track_id(4) rsvd(4)
    # duration(4) rsvd(8) layer(2) alt(2) vol(2) rsvd(2) matrix(36) w(4) h(4)
    tkhd = _box(
        b"tkhd",
        b"\x00" * 4
        + struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + b"\x00" * 8
        + b"\x00" * 36
        + struct.pack(">II", width << 16, height << 16),
    )
    hdlr = _box(b"hdlr", b"\x00" * 4 + b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00")
    stsd = _box(
        b"stsd",
        b"\x00" * 4
        + struct.pack(">I", 1)
        + _box(codec, b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70),
    )
    stbl = _box(b"stbl", stsd)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    mdat = _box(b"mdat", b"\x00" * 32)
    return ftyp + moov + mdat


def test_parse_minimal_mp4():
    m = parse_mp4_meta(_make_mp4())
    assert m["brand"] == "isom"
    assert m["timescale"] == 1000
    assert m["duration_s"] == pytest.approx(12.5)
    (trk,) = m["tracks"]
    assert trk == {"width": 640, "height": 360, "handler": "vide", "codec": "avc1"}


def test_parse_mvhd_version1_64bit_duration():
    m = parse_mp4_meta(_make_mp4(timescale=90_000, duration=90_000 * 7, version=1))
    assert m["duration_s"] == pytest.approx(7.0)


def test_rejects_non_mp4_and_malformed():
    with pytest.raises(ValueError, match="ftyp"):
        parse_mp4_meta(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
    data = bytearray(_make_mp4())
    data[0:4] = struct.pack(">I", 4)  # box size < 8 → malformed
    with pytest.raises(ValueError, match="malformed"):
        parse_mp4_meta(bytes(data))


def test_extract_video_meta_dataframe(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, payload=_make_mp4(width=1920, height=1080, codec=b"hvc1")),
            Row(doc_id=2, payload=_make_mp4(timescale=600, duration=600 * 3)),
        ]
    )
    out = {r["doc_id"]: r for r in extract_video_meta(df, "doc_id", "payload").collect()}
    assert out[1]["video_codec"] == "hvc1"
    assert (out[1]["width"], out[1]["height"]) == (1920, 1080)
    assert out[2]["duration_s"] == pytest.approx(3.0)
    assert out[2]["n_tracks"] == 1


def test_mjpeg_mp4_mux_demux_roundtrip():
    """build_mjpeg_mp4 emits a container our own metadata parser reads
    (codec 'jpeg', correct dims) and whose sample table demuxes back to
    the exact per-frame JPEG bitstreams."""
    import numpy as np

    from cassandra_extractor_spark.operators.jpegcodec import decode_jpeg
    from cassandra_extractor_spark.operators.multimodal import (
        build_mjpeg_mp4,
        demux_mp4_samples,
    )

    rng = np.random.default_rng(7)
    frames = []
    for _ in range(5):
        px = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
        frames.append((32, 24, 3, px.tobytes()))
    mp4 = build_mjpeg_mp4(frames, fps=10, quality=95)

    m = parse_mp4_meta(mp4)
    vid = next(t for t in m["tracks"] if t.get("handler") == "vide")
    assert vid["codec"] == "jpeg"
    assert (vid["width"], vid["height"]) == (32, 24)
    assert m["duration_s"] == 0.5  # 5 frames at 10 fps

    samples = demux_mp4_samples(mp4)
    assert len(samples) == 5
    for sm, (w, h, c, px) in zip(samples, frames):
        assert sm[:2] == b"\xff\xd8"  # each sample is a standalone JPEG
        dw, dh, dc, dpx = decode_jpeg(sm)
        assert (dw, dh, dc) == (w, h, c)
        err = np.abs(
            np.frombuffer(dpx, np.uint8).astype(int)
            - np.frombuffer(px, np.uint8).astype(int)
        )
        assert err.mean() < 12  # q95 lossy bound


def test_sample_frames_real_decodes_actual_video(spark):
    """sample_frames(real=True) on a Spark frame of MJPEG videos: frame
    rows come from the container's sample table (not a fake slice) and
    each emitted frame decodes to the muxed dimensions."""
    import numpy as np

    from cassandra_extractor_spark.operators.jpegcodec import decode_jpeg
    from cassandra_extractor_spark.operators.multimodal import (
        build_mjpeg_mp4,
        sample_frames,
    )

    rng = np.random.default_rng(11)
    rows = []
    for doc_id, n_frames in [(1, 6), (2, 9)]:
        frames = [
            (16, 16, 3, rng.integers(0, 256, size=16 * 16 * 3, dtype=np.uint8).tobytes())
            for _ in range(n_frames)
        ]
        rows.append(Row(doc_id=doc_id, payload=build_mjpeg_mp4(frames, fps=3)))
    df = spark.createDataFrame(rows)

    out = sample_frames(df, "doc_id", "payload", every_n=3, real=True).collect()
    got = {(r.doc_id, r.frame_idx) for r in out}
    assert got == {(1, 0), (1, 3), (2, 0), (2, 3), (2, 6)}
    for r in out:
        w, h, c, _px = decode_jpeg(bytes(r.frame))
        assert (w, h, c) == (16, 16, 3)


def test_demux_ignores_multichunk_audio_trak():
    """An interleaved audio trak with a multi-chunk stco (the normal
    layout) must not abort demux of a valid single-chunk video trak —
    the chunk-layout restriction applies only to the trak being
    demuxed."""
    from cassandra_extractor_spark.operators.multimodal import demux_mp4_samples

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    mvhd = _box(
        b"mvhd", b"\x00" * 4 + struct.pack(">IIII", 0, 0, 10, 2) + b"\x00" * 80
    )

    def trak(handler: bytes, stbl_children: bytes) -> bytes:
        hdlr = _box(b"hdlr", b"\x00" * 8 + handler + b"\x00" * 12 + b"\x00")
        return _box(b"trak", _box(b"mdia", hdlr + _box(b"minf", _box(b"stbl", stbl_children))))

    # audio: 2-chunk stco — would previously raise during its scan
    a_stsz = _box(b"stsz", b"\x00" * 4 + struct.pack(">III", 0, 2, 1) + struct.pack(">I", 1))
    a_stco = _box(b"stco", b"\x00" * 4 + struct.pack(">III", 2, 999, 1000))
    trak_a = trak(b"soun", a_stsz + a_stco)

    # video: two samples of 3 and 4 bytes in one chunk at mdat body
    v_stsz = _box(b"stsz", b"\x00" * 4 + struct.pack(">II", 0, 2) + struct.pack(">II", 3, 4))
    # build with a placeholder offset, measure, rebuild with the real one
    def build(offset: int) -> bytes:
        v_stco = _box(b"stco", b"\x00" * 4 + struct.pack(">II", 1, offset))
        trak_v = trak(b"vide", v_stsz + v_stco)
        moov = _box(b"moov", mvhd + trak_a + trak_v)
        return ftyp + moov + _box(b"mdat", b"abcdefg")

    probe = build(0)
    offset = len(probe) - len(_box(b"mdat", b"abcdefg")) + 8
    data = build(offset)
    assert demux_mp4_samples(data) == [b"abc", b"defg"]
