"""GIF decoder (LZW + palette + interlace) against an independent
test-local encoder and hand-packed bitstreams.

The encoder drives the decoder through table growth, width bumps, and
the KwKwK case; two hand-derived code streams pin the LZW semantics
against the spec directly (not just encoder/decoder self-consistency);
cross-format parity re-decodes the same pixels through PPM.
"""

import struct

import numpy as np
import pytest

from xpshacl_spark.operators.multimodal import (
    _decode_gif_bytes,
    _decode_gray,
    _gif_lzw_decode,
)


# ---------------------------------------------------------------------------
# independent encoder
# ---------------------------------------------------------------------------


class _BitPacker:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def put(self, code, width):
        self.acc |= code << self.bits
        self.bits += width
        while self.bits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.bits -= 8

    def flush(self):
        if self.bits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.bits = 0


def lzw_encode(indices, min_code):
    """GIF LZW compressor. Width scheduling mirrors the decoder's
    observable contract (the width of code k is fixed by the codes
    before it), computed by simulating the receiving side's table
    size — the standard 'early change-free' GIF timing."""
    clear = 1 << min_code
    eoi = clear + 1
    pk = _BitPacker()
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1

    # the decoder inserts one entry per received code after the first;
    # track its (next_code, width) to know each code's read width
    dec_next = [eoi + 1]
    dec_width = [min_code + 1]
    dec_first = [True]

    def emit(code):
        pk.put(code, dec_width[0])
        if code == clear:
            dec_next[0] = eoi + 1
            dec_width[0] = min_code + 1
            dec_first[0] = True
            return
        if code == eoi:
            return
        if dec_first[0]:
            dec_first[0] = False
            return
        dec_next[0] += 1
        if dec_next[0] == (1 << dec_width[0]) and dec_width[0] < 12:
            dec_width[0] += 1

    emit(clear)
    buf = ()
    for p in indices:
        cand = buf + (int(p),)
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        if next_code < (1 << 12):
            table[cand] = next_code
            next_code += 1
        else:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
        buf = (int(p),)
    if buf:
        emit(table[buf])
    emit(eoi)
    pk.flush()
    return bytes(pk.out)


def gif_bytes(indices_2d, palette, interlace=False, version=b"GIF89a",
              min_code=None):
    """Single-frame GIF from a 2-D index array + [(r,g,b), ...]."""
    arr = np.asarray(indices_2d)
    h, w = arr.shape
    n = len(palette)
    depth = max(1, (n - 1).bit_length())
    size = 1 << depth
    gct = b"".join(
        bytes(palette[i]) if i < n else b"\x00\x00\x00" for i in range(size)
    )
    mc = min_code if min_code is not None else max(2, depth)
    rows = arr
    if interlace:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        rows = arr[order]
    data = lzw_encode(rows.flatten().tolist(), mc)
    sub = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        sub += bytes([len(chunk)]) + chunk
    sub += b"\x00"
    iflags = (0x40 if interlace else 0)
    return (
        version
        + struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
        + gct
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
        + bytes([mc]) + bytes(sub)
        + b"\x3b"
    )


# ---------------------------------------------------------------------------
# hand-derived LZW streams (spec semantics, no encoder involved)
# ---------------------------------------------------------------------------


def _pack(codes, width):
    pk = _BitPacker()
    for c in codes:
        pk.put(c, width)
    pk.flush()
    return bytes(pk.out)


def test_lzw_hand_stream_basic():
    # min_code=2: clear=4, eoi=5; codes 4,0,0,1 at width 3 — the third
    # data code's insert fills the table to 2^3, so the remaining
    # codes 1,5 are read at width 4 (the spec width-bump timing)
    pk = _BitPacker()
    for c, w in ((4, 3), (0, 3), (0, 3), (1, 3), (1, 4), (5, 4)):
        pk.put(c, w)
    pk.flush()
    assert _gif_lzw_decode(2, bytes(pk.out), 10) == [0, 0, 1, 1]


def test_lzw_hand_stream_kwkwk():
    # codes [4, 1, 6, 5]: 6 == next_code -> KwKwK -> (1, 1); total 1 1 1
    data = _pack([4, 1, 6, 5], 3)
    assert _gif_lzw_decode(2, data, 10) == [1, 1, 1]


def test_lzw_rejects_invalid_code():
    import pytest

    data = _pack([4, 1, 7, 5], 3)  # 7 > next_code: corrupt
    with pytest.raises(ValueError):
        _gif_lzw_decode(2, data, 10)


# ---------------------------------------------------------------------------
# full-file round trips
# ---------------------------------------------------------------------------

PALETTE = [(0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 128, 255),
           (16, 32, 64), (200, 100, 50), (5, 250, 125), (90, 90, 90)]


def test_gif_roundtrip_arbitrary_indices():
    r = np.random.default_rng(11)
    for shape in ((1, 1), (3, 17), (16, 16), (23, 9)):
        idx = r.integers(0, len(PALETTE), shape)
        got = _decode_gif_bytes(gif_bytes(idx, PALETTE), pixels=True)
        assert got is not None, shape
        w, h, gray = got
        assert (w, h) == (shape[1], shape[0])
        want = np.array(
            [[sum(PALETTE[v]) / 3.0 for v in row] for row in idx]
        )
        assert np.allclose(gray, want), shape


def test_gif_roundtrip_long_run_grows_table():
    # a long constant run + repeats forces many table entries and at
    # least one width bump; both GIF versions accepted
    idx = np.zeros((20, 40), dtype=int)
    idx[5:15, 10:30] = 1
    idx[::3, ::5] = 2
    for version in (b"GIF87a", b"GIF89a"):
        got = _decode_gif_bytes(
            gif_bytes(idx, PALETTE, version=version), pixels=True
        )
        assert got is not None
        want = np.array(
            [[sum(PALETTE[v]) / 3.0 for v in row] for row in idx]
        )
        assert np.allclose(got[2], want)


def test_gif_interlaced_matches_progressive():
    r = np.random.default_rng(12)
    idx = r.integers(0, len(PALETTE), (13, 8))
    plain = _decode_gif_bytes(gif_bytes(idx, PALETTE), pixels=True)
    inter = _decode_gif_bytes(
        gif_bytes(idx, PALETTE, interlace=True), pixels=True
    )
    assert plain is not None and inter is not None
    assert np.allclose(plain[2], inter[2])


def test_gif_extension_blocks_skipped():
    idx = np.array([[1, 2], [3, 0]])
    g = gif_bytes(idx, PALETTE)
    # splice a graphic-control extension right before the image block
    i = g.index(b"\x2c")
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    got = _decode_gif_bytes(g[:i] + gce + g[i:], pixels=True)
    assert got is not None
    assert np.allclose(
        got[2], [[sum(PALETTE[v]) / 3.0 for v in row] for row in idx]
    )


def test_gif_rejects_corrupt():
    idx = np.array([[1, 0], [0, 1]])
    g = gif_bytes(idx, PALETTE)
    assert _decode_gif_bytes(b"GIF88a" + g[6:]) is None  # bad magic
    assert _decode_gif_bytes(g[:18]) is None  # truncated
    assert _decode_gif_bytes(b"GIF89a") is None
    # declared size larger than the pixel stream delivers
    bad = bytearray(g)
    w_off = g.index(b"\x2c") + 5
    bad[w_off:w_off + 2] = struct.pack("<H", 9)
    assert _decode_gif_bytes(bytes(bad)) is None


def test_gif_via_codec_seam_matches_ppm():
    # the same image through GIF and PPM must produce identical gray
    # grids through _decode_gray (cross-format pin, like BMP-vs-PPM)
    from tests.test_multimodal_dedup import ppm_bytes

    r = np.random.default_rng(13)
    idx = r.integers(0, len(PALETTE), (10, 12))
    pix = [[PALETTE[v] for v in row] for row in idx]
    got_gif = _decode_gray(gif_bytes(idx, PALETTE))
    got_ppm = _decode_gray(ppm_bytes(pix))
    assert got_gif[0] == "gif" and got_ppm[0] == "ppm"
    assert np.allclose(got_gif[3], got_ppm[3])


# ---------------------------------------------------------------------------
# animated GIF: composition, disposal, video integration
# ---------------------------------------------------------------------------


def gif_anim_bytes(frames, palette, screen=None, delay=4,
                   transparent=None, disposal=0, disposals=None):
    """Multi-frame GIF89a: frames = list of (indices_2d, left, top);
    disposals (optional) gives a per-frame disposal method."""
    n = len(palette)
    depth = max(1, (n - 1).bit_length())
    size = 1 << depth
    gct = b"".join(
        bytes(palette[i]) if i < n else b"\x00\x00\x00" for i in range(size)
    )
    if screen is None:
        arr0 = np.asarray(frames[0][0])
        screen = (arr0.shape[1], arr0.shape[0])
    sw, sh = screen
    mc = max(2, depth)
    out = bytearray(
        b"GIF89a" + struct.pack("<HHBBB", sw, sh, 0x80 | (depth - 1), 0, 0)
        + gct
    )
    for k, (indices, left, top) in enumerate(frames):
        arr = np.asarray(indices)
        h, w = arr.shape
        d = disposals[k] if disposals is not None else disposal
        packed = (d << 2) | (1 if transparent is not None else 0)
        out += b"\x21\xf9\x04" + bytes([packed]) + struct.pack(
            "<H", delay
        ) + bytes([transparent or 0]) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
        data = lzw_encode(arr.flatten().tolist(), mc)
        out += bytes([mc])
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def gray_of(idx):
    return np.array([[sum(PALETTE[v]) / 3.0 for v in row] for row in idx])


def test_gif_anim_metadata_and_full_frames(spark):
    from tests.test_multimodal_dedup import media_df, py_dhash
    from xpshacl_spark.operators.multimodal import (
        decode_video,
        video_frame_dhash,
    )

    r = np.random.default_rng(21)
    fr = [r.integers(0, len(PALETTE), (12, 16)) for _ in range(3)]
    g = gif_anim_bytes([(f, 0, 0) for f in fr], PALETTE, delay=5)
    media = media_df(spark, [g])
    meta = decode_video(media).collect()[0]
    assert (meta["format"], meta["width"], meta["height"]) == ("gif", 16, 12)
    assert meta["n_frames"] == 3
    assert meta["fps"] == pytest.approx(20.0)
    got = {
        r_["frame_idx"]: r_["dhash"]
        for r_ in video_frame_dhash(media).collect()
    }
    # full-frame animation: each composed frame IS the frame
    for k, f in enumerate(fr):
        want = py_dhash([list(map(float, row)) for row in gray_of(f)])
        assert got[k] == want, f"frame {k}"


def test_gif_anim_composition_transparency_and_disposal():
    from xpshacl_spark.operators.multimodal import _parse_gif_video

    base = np.ones((8, 10), dtype=int)  # palette 1 everywhere
    patch = np.full((3, 4), 2, dtype=int)
    patch[1, 1] = 0  # transparent hole (transparent index 0)
    dot = np.full((1, 1), 3, dtype=int)
    g = gif_anim_bytes(
        [(base, 0, 0), (patch, 5, 2), (dot, 0, 0)], PALETTE,
        transparent=0, disposals=[0, 2, 0],
    )
    got = _parse_gif_video(g, decode=True)
    assert got is not None
    _fps, sw, sh, frames = got
    assert (sw, sh) == (10, 8) and len(frames) == 3
    # frame 0: base paints the full screen (disposal 0 keeps it)
    assert np.allclose(frames[0], sum(PALETTE[1]) / 3.0)
    # frame 1: patch painted at (top=2, left=5), transparent hole keeps
    # the base color underneath
    want = np.full((8, 10), sum(PALETTE[1]) / 3.0)
    want[2:5, 5:9] = sum(PALETTE[2]) / 3.0
    want[3, 6] = sum(PALETTE[1]) / 3.0
    assert np.allclose(frames[1], want)
    # frame 2: the patch frame carried disposal 2, so ITS rect restores
    # to the BACKGROUND color (palette 0 — spec: background, not the
    # prior pixels) before the dot paints at (0, 0)
    want2 = np.full((8, 10), sum(PALETTE[1]) / 3.0)
    want2[2:5, 5:9] = sum(PALETTE[0]) / 3.0
    want2[0, 0] = sum(PALETTE[3]) / 3.0
    assert np.allclose(frames[2], want2)


def test_gif_anim_near_dup_with_trim(spark):
    from tests.test_multimodal_dedup import media_df
    from xpshacl_spark.operators.multimodal import video_near_dup_pairs

    r = np.random.default_rng(22)
    fr = [r.integers(0, len(PALETTE), (10, 12)) for _ in range(5)]
    payloads = [
        gif_anim_bytes([(f, 0, 0) for f in fr], PALETTE),
        gif_anim_bytes([(f, 0, 0) for f in fr[2:]], PALETTE),  # trim
        gif_anim_bytes(
            [(r.integers(0, len(PALETTE), (10, 12)), 0, 0)
             for _ in range(3)],
            PALETTE,
        ),
    ]
    media = media_df(spark, payloads)
    got = {
        (p["media_a"], p["media_b"]): p["n_shared"]
        for p in video_near_dup_pairs(media, min_shared=2).collect()
    }
    assert got == {(0, 1): 3}
