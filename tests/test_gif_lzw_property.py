"""Property tests for the GIF LZW codec: arbitrary index streams at
arbitrary code sizes must round-trip ``lzw_encode`` → ``_lzw_decode``
exactly, and the full GIF container (header + color table + sub-block
framing + optional interlace) must round-trip through ``decode_gif``.

The decoder is separately pinned against JDK ImageIO fixtures
(tests/test_media_codecs.py) so encoder and decoder cannot share a
spec misreading; these properties then push the shared code paths
into corners fixtures don't reach (tiny alphabets where width bumps
start at 3 bits, KwKwK-dense low-entropy streams, >4096-entry table
resets, ragged interlace heights).
"""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from conduit_spark.analytics.media_codecs import (
    _lzw_decode,
    decode_gif,
    lzw_encode,
)


@st.composite
def stream_and_code_size(draw):
    min_code = draw(st.integers(min_value=2, max_value=8))
    alphabet = 1 << min_code
    # low-entropy runs maximize dictionary reuse (and KwKwK hits);
    # uniform noise maximizes dictionary growth — draw a mix
    runs = draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=alphabet - 1),
                st.integers(min_value=1, max_value=30),
            ),
            min_size=1,
            max_size=80,
        )
    )
    idx = [v for v, n in runs for _ in range(n)]
    return idx, min_code


@given(stream_and_code_size())
@settings(max_examples=200, deadline=None)
def test_lzw_roundtrip(case):
    idx, min_code = case
    assert _lzw_decode(lzw_encode(idx, min_code), min_code) == idx


@given(st.integers(min_value=2, max_value=4))
@settings(max_examples=3, deadline=None)
def test_lzw_table_full_reset_roundtrip(min_code):
    """Force >4096 dictionary entries so the encoder's table-full CLEAR
    path runs, at small alphabets where codes widen 3→12 bits."""
    alphabet = 1 << min_code
    idx = [(i * i + 7 * i) % alphabet for i in range(30000)]
    assert _lzw_decode(lzw_encode(idx, min_code), min_code) == idx


@st.composite
def gif_image(draw):
    w = draw(st.integers(min_value=1, max_value=24))
    h = draw(st.integers(min_value=1, max_value=24))
    size_field = draw(st.integers(min_value=1, max_value=7))
    n_colors = 2 << size_field
    pal = draw(st.binary(min_size=3 * n_colors, max_size=3 * n_colors))
    idx = draw(
        st.lists(
            st.integers(min_value=0, max_value=n_colors - 1),
            min_size=w * h,
            max_size=w * h,
        )
    )
    interlaced = draw(st.booleans())
    return w, h, size_field, pal, idx, interlaced


def _assemble_gif(w, h, size_field, pal, stream, interlaced):
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    out += pal
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlaced else 0
    )
    min_code = max(2, size_field + 1)
    out.append(min_code)
    comp = lzw_encode(stream, min_code)
    i = 0
    while i < len(comp):
        blk = comp[i : i + 255]
        out.append(len(blk))
        out += blk
        i += 255
    out += b"\x00\x3b"
    return bytes(out)


@given(gif_image())
@settings(max_examples=80, deadline=None)
def test_gif_container_roundtrip(case):
    w, h, size_field, pal, idx, interlaced = case
    if interlaced:
        order = []
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            order.extend(range(start, h, step))
        rows = [idx[r * w : (r + 1) * w] for r in range(h)]
        stream = [v for r in order for v in rows[r]]
    else:
        stream = idx
    meta = decode_gif(
        _assemble_gif(w, h, size_field, pal, stream, interlaced),
        return_pixels=True,
    )
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["interlaced"] is interlaced
    assert meta["indices"] == idx  # de-interlaced back to row-major
    rgb = [pal[3 * v + c] for v in idx for c in range(3)]
    assert meta["pixel_min"] == min(rgb)
    assert meta["pixel_max"] == max(rgb)
    assert abs(meta["pixel_mean"] - sum(rgb) / len(rgb)) < 1e-9
