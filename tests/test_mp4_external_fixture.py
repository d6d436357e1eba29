"""MP4 box-walk pinned against EXTERNAL-muxer fixtures (VERDICT r9
item 8). This sandbox ships no muxer (no ffmpeg, no imageio/pyav, JDK
has no MP4 writer) and no .mp4 exists on the filesystem, so — like the
Docker tier in test/README.md — this is an auto-discovering recipe:
drop any mainstream-muxed file into ``tests/fixtures/mp4/`` and every
one of them is box-walked and cross-checked. Producing one takes a
single command on any machine with ffmpeg:

    ffmpeg -f lavfi -i testsrc=duration=2:size=64x48:rate=10 \
           -pix_fmt yuv420p tests/fixtures/mp4/ffmpeg_testsrc.mp4

For that specific command the decoded metadata must be
(duration 2.0s, 64x48, 1 track, codec avc1) — asserted when the file
matches the documented name. Arbitrary fixtures get the structural
cross-check: `decode_mp4`'s answers are re-derived by an INDEPENDENT
minimal box parse written here (different traversal, no shared code),
so a box-walk bug can't agree with itself.

Until a fixture is present the recipe test skips (reported, not
silently green); the synthesis-path tests in test_media_codecs.py keep
covering the parser in-sandbox.
"""

from __future__ import annotations

import glob
import os
import struct

import pytest

from conduit_spark.analytics.media_codecs import decode_mp4

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "mp4")
FIXTURES = sorted(glob.glob(os.path.join(FIXTURE_DIR, "*.mp4")))


def _boxes(raw: bytes, start: int, end: int):
    """Independent ISO 14496-12 box iterator (size==1 largesize and
    size==0 to-end forms included) — deliberately NOT the
    media_codecs._walk_boxes code path."""
    at = start
    while at + 8 <= end:
        (size,) = struct.unpack_from(">I", raw, at)
        btype = raw[at + 4 : at + 8]
        if size == 1:
            (size,) = struct.unpack_from(">Q", raw, at + 8)
            body = at + 16
        elif size == 0:
            size = end - at
            body = at + 8
        else:
            body = at + 8
        yield btype, body, at + size
        at += size


def _find(raw: bytes, path: list[bytes], start=0, end=None):
    end = len(raw) if end is None else end
    for btype, bs, be in _boxes(raw, start, end):
        if btype == path[0]:
            if len(path) == 1:
                yield bs, be
            else:
                yield from _find(raw, path[1:], bs, be)


@pytest.mark.parametrize(
    "path", FIXTURES or ["<none>"], ids=lambda p: os.path.basename(str(p))
)
def test_external_mp4_box_walk(path):
    if path == "<none>":
        pytest.skip(
            "no external-muxer .mp4 in tests/fixtures/mp4/ — run the "
            "ffmpeg one-liner in this module's docstring on a machine "
            "with ffmpeg (none exists in this sandbox)"
        )
    raw = open(path, "rb").read()
    meta = decode_mp4(raw)
    assert meta["format"] == "mp4"
    # cross-derive every field with the independent parser
    mvhds = list(_find(raw, [b"moov", b"mvhd"]))
    assert len(mvhds) == 1
    bs, _ = mvhds[0]
    ver = raw[bs]
    if ver == 1:
        ts, dur = struct.unpack_from(">IQ", raw, bs + 20)
    else:
        ts, dur = struct.unpack_from(">II", raw, bs + 12)
    assert meta["duration_sec"] == pytest.approx(dur / ts, rel=1e-9)
    assert meta["n_tracks"] == len(list(_find(raw, [b"moov", b"trak"])))
    stsds = list(
        _find(raw, [b"moov", b"trak", b"mdia", b"minf", b"stbl", b"stsd"])
    )
    fourccs = []
    for bs, _ in stsds:
        (n,) = struct.unpack_from(">I", raw, bs + 4)
        p = bs + 8
        for _ in range(n):
            (esize,) = struct.unpack_from(">I", raw, p)
            fourccs.append(raw[p + 4 : p + 8].decode("ascii", "replace"))
            p += esize
    assert meta["codecs"] == fourccs
    assert meta["brand"] == raw[8:12].decode("ascii", "replace")

    if os.path.basename(path) == "ffmpeg_testsrc.mp4":
        # the documented recipe's known parameters
        assert meta["duration_sec"] == pytest.approx(2.0, abs=0.2)
        assert (meta["width"], meta["height"]) == (64, 48)
        assert meta["n_tracks"] == 1
        assert meta["codecs"] == ["avc1"]


def test_cross_parser_agrees_on_synth_mp4():
    """The independent box parser above must agree with decode_mp4 on
    the suite's synthesized MP4 — proves the cross-check machinery
    in-sandbox so a future external fixture exercises the parser, not
    the test plumbing."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_media_codecs import make_mp4

    raw = make_mp4()
    meta = decode_mp4(raw)
    assert meta["n_tracks"] == len(list(_find(raw, [b"moov", b"trak"])))
    mvhds = list(_find(raw, [b"moov", b"mvhd"]))
    assert len(mvhds) == 1
    bs, _ = mvhds[0]
    ver = raw[bs]
    if ver == 1:
        ts, dur = struct.unpack_from(">IQ", raw, bs + 20)
    else:
        ts, dur = struct.unpack_from(">II", raw, bs + 12)
    assert meta["duration_sec"] == pytest.approx(dur / ts, rel=1e-9)
