"""Ogg container layer (RFC 3533): page parse, packet assembly, granule
utilities, and bisection seek support.

Shared by Vorbis (stb_vorbis2.d's embedded Ogg layer), Opus (dopus.d
OggStream, dopus.d:6955) and Ogg-encapsulated FLAC (drflac.d:2196).  CRC is
computed for the page writer and verified on read when the caller asks:
the reference's Opus reader rejects bad-CRC pages (dopus.d:7080-7084)
while its Vorbis reader only checks CRC during seek scans, so
verification is per-reader opt-in.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import List, Optional

import numpy as np

_CRC_TABLE = np.zeros(256, dtype=np.uint32)
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ (0x04C11DB7 if _r & 0x80000000 else 0)) & 0xFFFFFFFF
    _CRC_TABLE[_i] = _r


def ogg_crc(data: bytes) -> int:
    from ..host import native

    lib = native.get_lib()
    if lib is not None:
        return native.ogg_crc(lib, data)
    crc = 0
    tab = _CRC_TABLE
    for b in data:
        crc = ((crc << 8) ^ int(tab[((crc >> 24) & 0xFF) ^ b])) & 0xFFFFFFFF
    return crc


def _page_crc_ok(view, offset: int, nsegs: int, body_size: int,
                 stored: int) -> bool:
    """Verify a page's CRC with the CRC field zeroed (RFC 3533 §6)."""
    end = offset + 27 + nsegs + body_size
    buf = bytes(view[offset : offset + 22]) + b"\x00\x00\x00\x00" + \
        bytes(view[offset + 26 : end])
    return ogg_crc(buf) == stored


@dataclasses.dataclass
class OggPage:
    offset: int  # byte offset of the page header
    header_type: int  # 1=continued, 2=first (BOS), 4=last (EOS)
    granule: int  # s64 granule position (-1 = no packet ends here)
    serial: int
    seq: int
    segment_sizes: List[int]
    body_offset: int
    body_size: int

    @property
    def is_continued(self) -> bool:
        return bool(self.header_type & 1)

    @property
    def is_bos(self) -> bool:
        return bool(self.header_type & 2)

    @property
    def is_eos(self) -> bool:
        return bool(self.header_type & 4)


def parse_page(view, offset: int, verify_crc: bool = False) \
        -> Optional[OggPage]:
    """Parse the page at `offset`; returns None if invalid/truncated (or,
    with verify_crc, if the page checksum fails — dopus.d:7080)."""
    if offset + 27 > len(view) or bytes(view[offset : offset + 4]) != b"OggS":
        return None
    if view[offset + 4] != 0:
        return None  # version
    header_type = view[offset + 5]
    granule = struct.unpack_from("<q", view, offset + 6)[0]
    serial, seq, crc = struct.unpack_from("<III", view, offset + 14)
    nsegs = view[offset + 26]
    if offset + 27 + nsegs > len(view):
        return None
    seg_sizes = list(view[offset + 27 : offset + 27 + nsegs])
    body_offset = offset + 27 + nsegs
    body_size = sum(seg_sizes)
    if body_offset + body_size > len(view):
        return None
    if verify_crc and not _page_crc_ok(view, offset, nsegs, body_size, crc):
        return None
    return OggPage(offset, header_type, granule, serial, seq, seg_sizes,
                   body_offset, body_size)


def find_page(view, start: int, verify_crc: bool = False) \
        -> Optional[OggPage]:
    """Scan forward for the next valid page at or after `start`."""
    n = len(view)
    if start >= n - 27:
        return None
    arr = np.frombuffer(view, dtype=np.uint8, count=n)
    cand = np.flatnonzero(
        (arr[start : n - 3] == 0x4F)
        & (arr[start + 1 : n - 2] == 0x67)
        & (arr[start + 2 : n - 1] == 0x67)
        & (arr[start + 3 : n] == 0x53)
    )
    for c in cand:
        page = parse_page(view, start + int(c), verify_crc)
        if page is not None:
            return page
    return None


class OggPacketReader:
    """Sequential packet reader for one logical stream (by serial)."""

    def __init__(self, view, serial: Optional[int] = None, start: int = 0,
                 verify_crc: bool = False):
        self._view = view
        self._serial = serial
        self._verify_crc = verify_crc
        self._page: Optional[OggPage] = None
        self._seg_idx = 0
        self._body_pos = 0
        self._pos = start
        self._partial = bytearray()
        self._fresh = True  # skip a leading continued-packet tail

    def _next_page(self) -> bool:
        while True:
            page = find_page(self._view, self._pos, self._verify_crc)
            if page is None:
                return False
            self._pos = page.body_offset + page.body_size
            if self._serial is None or page.serial == self._serial:
                self._page = page
                self._seg_idx = 0
                self._body_pos = page.body_offset
                if self._fresh and page.is_continued:
                    # discard the tail of a packet that began before the
                    # reset point (seek landing mid-packet); may span pages
                    ended = False
                    while self._seg_idx < len(page.segment_sizes):
                        seg = page.segment_sizes[self._seg_idx]
                        self._body_pos += seg
                        self._seg_idx += 1
                        if seg < 255:
                            ended = True
                            break
                    self._fresh = not ended
                else:
                    self._fresh = False
                return True

    def reset(self, byte_offset: int) -> None:
        self._pos = byte_offset
        self._page = None
        self._partial = bytearray()
        self._fresh = True

    def next_packet(self):
        """Returns (packet_bytes, granule_if_last_packet_on_page | None) or
        None at EOS.  Continued packets are reassembled across pages."""
        out = self._partial
        self._partial = bytearray()
        while True:
            if self._page is None or self._seg_idx >= len(self._page.segment_sizes):
                if not self._next_page():
                    return None
                # a fresh page that doesn't continue: drop stale partial data
                if out and not self._page.is_continued:
                    out = bytearray()
            page = self._page
            done = False
            while self._seg_idx < len(page.segment_sizes):
                seg = page.segment_sizes[self._seg_idx]
                out += self._view[self._body_pos : self._body_pos + seg]
                self._body_pos += seg
                self._seg_idx += 1
                if seg < 255:
                    done = True
                    break
            if done:
                # page.granule names the last packet COMPLETED on the page
                granule = None
                if self._seg_idx == len(page.segment_sizes) and page.granule != -1:
                    granule = page.granule
                return bytes(out), granule
            # packet continues on the next page


def last_granule(view, serial: Optional[int] = None) -> int:
    """Granule position of the stream's last page (duration lookup,
    stb_vorbis2.d:3797-3869 / dopus.d findLastPage)."""
    arr = np.frombuffer(view, dtype=np.uint8)
    n = len(arr)
    cand = np.flatnonzero(
        (arr[: n - 3] == 0x4F) & (arr[1 : n - 2] == 0x67)
        & (arr[2 : n - 1] == 0x67) & (arr[3:] == 0x53)
    )
    best = -1
    for c in cand[::-1]:
        page = parse_page(view, int(c))
        if page is not None and (serial is None or page.serial == serial):
            if page.granule != -1:
                return page.granule
            best = max(best, -1)
    return best


def page_offsets(view, serial: Optional[int] = None):
    """All (offset, granule) page anchors — the bisection-seek index."""
    arr = np.frombuffer(view, dtype=np.uint8)
    n = len(arr)
    cand = np.flatnonzero(
        (arr[: n - 3] == 0x4F) & (arr[1 : n - 2] == 0x67)
        & (arr[2 : n - 1] == 0x67) & (arr[3:] == 0x53)
    )
    out = []
    for c in cand:
        page = parse_page(view, int(c))
        if page is not None and (serial is None or page.serial == serial):
            out.append((int(c), page.granule))
    return out


# ---------------------------------------------------------------------------
# Page writer (fixtures, tests)
# ---------------------------------------------------------------------------

def build_page(packets: List[bytes], serial: int, seq: int, granule: int,
               bos: bool = False, eos: bool = False,
               continued: bool = False) -> bytes:
    segs = bytearray()
    body = bytearray()
    for i, p in enumerate(packets):
        n = len(p)
        while True:
            seg = min(n, 255)
            segs.append(seg)
            n -= seg
            if seg < 255:
                break
        body += p
    hdr = bytearray(b"OggS\x00")
    hdr.append((1 if continued else 0) | (2 if bos else 0) | (4 if eos else 0))
    hdr += struct.pack("<q", granule)
    hdr += struct.pack("<II", serial, seq)
    hdr += b"\x00\x00\x00\x00"  # CRC placeholder
    hdr.append(len(segs))
    hdr += segs
    page = bytes(hdr) + bytes(body)
    crc = ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]
