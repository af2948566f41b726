"""Real codec-free multimodal decode: BMP/WAV/Y4M encoder↔parser round
trips (off-Spark numpy), fused decode+stats kernels vs closed-form values,
and honest NotImplementedError stubs for compressed formats."""

import numpy as np
import pytest

from linkgraph.pipeline.multimodal import (
    _encode_bmp,
    _encode_wav,
    _encode_y4m,
    _parse_bmp,
    _parse_wav,
    _parse_y4m,
    audio_stats,
    decode_audio,
    decode_video_frames,
    image_stats,
    synthesize_media,
    video_frame_stats,
)


# ------------------------------------------------------ parser round trips


def test_bmp_roundtrip_odd_width():
    """Odd widths force nonzero row padding — the classic BMP parse bug."""
    rng = np.random.RandomState(7)
    for w, h in [(13, 7), (16, 10), (1, 1), (5, 3)]:
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (_parse_bmp(_encode_bmp(img)) == img).all(), (w, h)


def test_bmp_topdown_negative_height():
    """A top-down BMP (negative biHeight) must decode to the same image."""
    img = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(4, 5, 3)
    buf = bytearray(_encode_bmp(img))
    # rewrite height to -h and store rows top-down un-flipped
    stride = (5 * 3 + 3) // 4 * 4
    buf[22:26] = np.int32(-4).tobytes()
    body = np.zeros((4, stride), dtype=np.uint8)
    body[:, : 5 * 3] = img[:, :, ::-1].reshape(4, 5 * 3)  # RGB→BGR, no flip
    buf[54:] = body.tobytes()
    assert (_parse_bmp(bytes(buf)) == img).all()


def test_wav_roundtrip():
    s = (np.arange(-500, 500, 7)).astype(np.int16)
    out, rate = _parse_wav(_encode_wav(s, 8000))
    assert rate == 8000
    assert (out == s).all()


def test_y4m_roundtrip():
    frames = np.arange(3 * 8 * 16, dtype=np.uint8).reshape(3, 8, 16)
    assert (_parse_y4m(_encode_y4m(frames)) == frames).all()


def test_unsupported_formats_raise():
    with pytest.raises(NotImplementedError, match="STUB"):
        _parse_bmp(b"\x89PNG\r\n\x1a\nrest")
    with pytest.raises(ValueError):
        _parse_bmp(b"XXnot a bmp at all" * 4)
    # 8-bit palette BMP: header says bpp=8
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    buf = bytearray(_encode_bmp(img))
    buf[28:30] = np.uint16(8).tobytes()
    with pytest.raises(NotImplementedError, match="24-bit"):
        _parse_bmp(bytes(buf))
    # stereo WAV
    s = np.zeros(10, dtype=np.int16)
    wav = bytearray(_encode_wav(s, 8000))
    wav[22:24] = np.uint16(2).tobytes()
    with pytest.raises(NotImplementedError, match="PCM-16 mono"):
        _parse_wav(bytes(wav))
    # 4:2:0 Y4M
    y4m = b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420\nFRAME\n" + bytes(24)
    with pytest.raises(NotImplementedError, match="Cmono"):
        _parse_y4m(y4m)


def test_truncated_payloads_raise_not_mis_stat():
    """Corrupt/short payloads must raise a descriptive ValueError, never
    silently decode fewer samples/pixels (which would yield wrong stats)."""
    # WAV: data chunk declares more bytes than the buffer holds
    s = np.arange(100, dtype=np.int16)
    wav = bytearray(_encode_wav(s, 8000))
    short = bytes(wav[:-50])  # chop the tail of the data chunk
    with pytest.raises(ValueError, match="truncated WAV"):
        _parse_wav(short)
    # WAV: the data chunk's declared size points far past the end
    evil = bytearray(_encode_wav(s, 8000))
    data_at = bytes(evil).find(b"data")
    evil[data_at + 4 : data_at + 8] = np.uint32(10**9).tobytes()
    with pytest.raises(ValueError, match="truncated WAV"):
        _parse_wav(bytes(evil))
    # Y4M: frame body shorter than W*H
    frames = np.arange(2 * 4 * 4, dtype=np.uint8).reshape(2, 4, 4)
    y4m = _encode_y4m(frames)
    with pytest.raises(ValueError, match="truncated Y4M"):
        _parse_y4m(y4m[:-5])
    # Y4M: header never terminated
    with pytest.raises(ValueError, match="truncated Y4M"):
        _parse_y4m(b"YUV4MPEG2 W4 H4 Cmono")
    # BMP: pixel array chopped
    img = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    bmp = _encode_bmp(img)
    with pytest.raises(ValueError, match="truncated BMP"):
        _parse_bmp(bmp[:-10])


# -------------------------------------------- fused stats vs closed forms

SEED = 7


def _expected_image_stats(i):
    w, h = 13 + i % 5, 7 + i % 4
    y, x = np.mgrid[0:h, 0:w]
    r = (SEED + i + 3 * x + 7 * y) % 256
    g = (SEED + 2 * i + 5 * x + 11 * y) % 256
    b = (SEED + 3 * i + 13 * x + 17 * y) % 256
    p = (y * w + x + 1).astype(np.int64)
    return {
        "width": w, "height": h,
        "sum_r": int(r.sum()), "sum_g": int(g.sum()), "sum_b": int(b.sum()),
        "wsum": int((p * (r + 2 * g + 3 * b)).sum()),
    }


def test_image_stats_closed_form(spark):
    media = synthesize_media(spark, n_rows=12, seed=SEED)
    got = {r["media_id"]: r.asDict() for r in
           image_stats(media.filter("kind = 'image'")).collect()}
    assert set(got) == {0, 3, 6, 9}
    for i, row in got.items():
        exp = _expected_image_stats(i)
        for k, v in exp.items():
            assert row[k] == v, (i, k)


def test_audio_stats_closed_form(spark):
    media = synthesize_media(spark, n_rows=12, seed=SEED)
    got = {r["media_id"]: r.asDict() for r in
           audio_stats(media.filter("kind = 'audio'")).collect()}
    assert set(got) == {1, 4, 7, 10}
    for i, row in got.items():
        n = 100 + i % 50
        idx = np.arange(n, dtype=np.int64)
        s = (SEED + 31 * i + 17 * idx) % 2003 - 1001
        assert row["n_samples"] == n and row["sample_rate"] == 8000
        assert row["sum_amp"] == int(s.sum())
        assert row["sum_abs"] == int(np.abs(s).sum())
        assert row["wsum"] == int(((idx + 1) * s).sum())


def test_video_stats_closed_form(spark):
    media = synthesize_media(spark, n_rows=12, seed=SEED)
    got = {(r["media_id"], r["frame_idx"]): r.asDict() for r in
           video_frame_stats(media.filter("kind = 'video'")).collect()}
    ids = {i for i, _ in got}
    assert ids == {2, 5, 8, 11}
    for i in ids:
        nf = 1 + i % 4
        assert {f for j, f in got if j == i} == set(range(nf))
        f, y, x = np.mgrid[0:nf, 0:8, 0:16]
        luma = ((SEED + i + 3 * f + 5 * x + 7 * y) % 256).astype(np.int64)
        p = (y[0] * 16 + x[0] + 1).astype(np.int64)
        for fi in range(nf):
            assert got[(i, fi)]["sum_luma"] == int(luma[fi].sum())
            assert got[(i, fi)]["wsum"] == int((p * luma[fi]).sum())


def test_decode_matches_stats(spark):
    """decode_* array outputs agree with the fused stats kernels."""
    media = synthesize_media(spark, n_rows=9, seed=SEED)
    aud = {r["media_id"]: np.array(r["samples"], dtype=np.int64)
           for r in decode_audio(media.filter("kind = 'audio'")).collect()}
    st = {r["media_id"]: r for r in
          audio_stats(media.filter("kind = 'audio'")).collect()}
    for i, s in aud.items():
        assert int(s.sum()) == st[i]["sum_amp"]
    vid = decode_video_frames(media.filter("kind = 'video'"), every_n=2)
    for r in vid.collect():
        assert r["frame_idx"] % 2 == 0
        assert len(r["luma"]) == r["width"] * r["height"]
