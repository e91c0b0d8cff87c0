"""Minimal MP4 box surgery: inject a BT.709 `colr` atom.

The service layer's ffmpeg path always tags output H.264 streams with
BT.709 primaries/transfer/matrix (reference image_interpolator.py:90-106).
The cv2 fallback encoder (used when ffmpeg is absent) cannot set color
metadata, leaving players to guess — the round-2 advisor flagged the
divergence.  This patcher appends an nclx `colr` box to the video sample
entry after the fact.

Safe because cv2 (like default ffmpeg) writes `moov` AFTER `mdat`:
growing `moov` does not shift media data, so `stco`/`co64` chunk offsets
stay valid.  If the layout is unexpected (moov before mdat, missing
boxes), the patcher leaves the file untouched and returns False.
"""
from __future__ import annotations

import struct

# nclx: primaries 1 (BT.709), transfer 1 (BT.709), matrix 1 (BT.709),
# full_range flag 0 — matches ffmpeg's "-color_primaries bt709
# -color_trc bt709 -colorspace bt709".
_COLR_NCLX = b"colr" + b"nclx" + struct.pack(">HHHB", 1, 1, 1, 0)
# box size field counts itself (4) plus everything after, type included
_COLR_BOX = struct.pack(">I", 4 + len(_COLR_NCLX)) + _COLR_NCLX

_SAMPLE_ENTRY_KINDS = (b"avc1", b"avc3", b"hev1", b"hvc1", b"mp4v", b"vp09")


def _iter_boxes(buf: bytes, start: int, end: int):
    off = start
    while off + 8 <= end:
        size, kind = struct.unpack(">I4s", buf[off:off + 8])
        if size == 1:  # 64-bit largesize
            size = struct.unpack(">Q", buf[off + 8:off + 16])[0]
        if size < 8 or off + size > end:
            return
        yield off, size, kind
        off += size


def _find_path(buf: bytes, start: int, end: int, path: list[bytes]):
    """Offsets of nested boxes along `path`; None if any level missing."""
    out = []
    for depth, want in enumerate(path):
        hit = None
        for off, size, kind in _iter_boxes(buf, start, end):
            if kind == want:
                hit = (off, size)
                break
        if hit is None:
            return None
        out.append(hit)
        start, end = hit[0] + 8, hit[0] + hit[1]
        if want == b"stsd":  # full box + entry count precede children
            start += 8
    return out


def tag_bt709(path: str) -> bool:
    """Insert a BT.709 colr atom into `path`'s video sample entry.

    Returns True when the file was modified (or already tagged)."""
    with open(path, "rb") as f:
        buf = bytearray(f.read())

    top = list(_iter_boxes(buf, 0, len(buf)))
    moov = next(((o, s) for o, s, k in top if k == b"moov"), None)
    mdat = next(((o, s) for o, s, k in top if k == b"mdat"), None)
    if moov is None or (mdat is not None and moov[0] < mdat[0]):
        return False  # unexpected layout: offsets would shift, bail

    chain = [b"trak", b"mdia", b"minf", b"stbl", b"stsd"]
    boxes = _find_path(bytes(buf), moov[0] + 8, moov[0] + moov[1], chain)
    if boxes is None:
        return False
    stsd_off, stsd_size = boxes[-1]

    # first sample entry inside stsd
    entry = next(iter(_iter_boxes(bytes(buf), stsd_off + 16,
                                  stsd_off + stsd_size)), None)
    if entry is None or entry[2] not in _SAMPLE_ENTRY_KINDS:
        return False
    e_off, e_size, _ = entry

    # already tagged? (sample-entry children start after the 78-byte
    # VisualSampleEntry header)
    for _, _, kind in _iter_boxes(bytes(buf), e_off + 8 + 78, e_off + e_size):
        if kind == b"colr":
            return True

    insert_at = e_off + e_size
    grow = len(_COLR_BOX)
    buf[insert_at:insert_at] = _COLR_BOX

    # grow every ancestor box size: moov, trak..stsd, and the entry
    for off, size in [moov, *boxes, (e_off, e_size)]:
        new = size + grow
        if struct.unpack(">I", buf[off:off + 4])[0] == 1:
            buf[off + 8:off + 16] = struct.pack(">Q", new)
        else:
            buf[off:off + 4] = struct.pack(">I", new)

    with open(path, "wb") as f:
        f.write(buf)
    return True


def read_colr(path: str):
    """Parse back the colr nclx triple (primaries, transfer, matrix) or
    None — used by tests and the video analyzer."""
    with open(path, "rb") as f:
        buf = f.read()
    moov = next(((o, s) for o, s, k in _iter_boxes(buf, 0, len(buf))
                 if k == b"moov"), None)
    if moov is None:
        return None
    boxes = _find_path(buf, moov[0] + 8, moov[0] + moov[1],
                       [b"trak", b"mdia", b"minf", b"stbl", b"stsd"])
    if boxes is None:
        return None
    stsd_off, stsd_size = boxes[-1]
    entry = next(iter(_iter_boxes(buf, stsd_off + 16, stsd_off + stsd_size)), None)
    if entry is None:
        return None
    e_off, e_size, _ = entry
    for off, size, kind in _iter_boxes(buf, e_off + 8 + 78, e_off + e_size):
        if kind == b"colr" and buf[off + 8:off + 12] == b"nclx":
            return struct.unpack(">HHH", buf[off + 12:off + 18])
    return None
