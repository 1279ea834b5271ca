"""Bit-level readers for the host demux/entropy stage.

The reference embeds a bespoke bit-reader per codec (FLAC's two-level bitcache
drflac.d:306,680-699; MP3's ``bs_t``/``get_bits`` minimp3.d:169,216; Vorbis'
LSB-first packet reader; QOA's big-endian u64 words qoa.d).  We centralise the
two packing conventions here:

* :class:`BitReaderMSB` — MSB-first within each byte (FLAC, MP3, Opus framing)
* :class:`BitReaderLSB` — LSB-first within each byte (Vorbis)

These Python implementations are the *correctness reference*; the C++ host
stage (``audio_formats_tpu/host``) provides the production-speed equivalents
and is tested for equality against these.
"""

from __future__ import annotations

from ..errors import AudioFormatError


class BitReaderMSB:
    """MSB-first bit reader over a buffer, with byte-granular positioning."""

    __slots__ = ("_buf", "_bitpos", "_nbits")

    def __init__(self, buf, start_byte: int = 0):
        self._buf = memoryview(buf).cast("B")
        self._bitpos = start_byte * 8
        self._nbits = len(self._buf) * 8

    def bits_left(self) -> int:
        return self._nbits - self._bitpos

    def tell_bits(self) -> int:
        return self._bitpos

    def seek_bits(self, bitpos: int) -> None:
        self._bitpos = bitpos

    def byte_aligned(self) -> bool:
        return self._bitpos % 8 == 0

    def align_to_byte(self) -> None:
        self._bitpos = (self._bitpos + 7) & ~7

    def read(self, n: int) -> int:
        """Read ``n`` bits as an unsigned int (n may exceed 32)."""
        p = self._bitpos
        if p + n > self._nbits:
            raise AudioFormatError("Bit reader: read past end")
        self._bitpos = p + n
        if n == 0:
            return 0
        first = p >> 3
        last = (p + n - 1) >> 3
        word = int.from_bytes(self._buf[first : last + 1], "big")
        shift = (last + 1) * 8 - (p + n)
        return (word >> shift) & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        if v >= 1 << (n - 1):
            v -= 1 << n
        return v

    def read_unary(self) -> int:
        """Count zero bits up to the first 1 bit (Rice/unary prefix)."""
        buf, p, nbits = self._buf, self._bitpos, self._nbits
        count = 0
        # Skip whole zero bytes fast.
        while p < nbits:
            byte = buf[p >> 3]
            rem = 8 - (p & 7)
            chunk = byte & ((1 << rem) - 1)
            if chunk == 0:
                count += rem
                p += rem
            else:
                lead = rem - chunk.bit_length()
                count += lead
                p += lead + 1
                self._bitpos = p
                return count
        raise AudioFormatError("Bit reader: unary read past end")

    def skip(self, n: int) -> None:
        if self._bitpos + n > self._nbits:
            raise AudioFormatError("Bit reader: skip past end")
        self._bitpos += n


class BitReaderLSB:
    """LSB-first bit reader (Vorbis packet convention)."""

    __slots__ = ("_buf", "_bitpos", "_nbits")

    def __init__(self, buf, start_byte: int = 0):
        self._buf = memoryview(buf).cast("B")
        self._bitpos = start_byte * 8
        self._nbits = len(self._buf) * 8

    def bits_left(self) -> int:
        return self._nbits - self._bitpos

    def tell_bits(self) -> int:
        return self._bitpos

    def read(self, n: int) -> int:
        p = self._bitpos
        if p + n > self._nbits:
            raise AudioFormatError("Bit reader: read past end")
        self._bitpos = p + n
        if n == 0:
            return 0
        first = p >> 3
        last = (p + n - 1) >> 3
        word = int.from_bytes(self._buf[first : last + 1], "little")
        return (word >> (p & 7)) & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        """Peek up to n bits; bits past the end read as zero."""
        p = self._bitpos
        first = p >> 3
        last = min((p + n - 1) >> 3, len(self._buf) - 1)
        if first > last:
            return 0
        word = int.from_bytes(self._buf[first : last + 1], "little")
        return (word >> (p & 7)) & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        if self._bitpos + n > self._nbits:
            raise AudioFormatError("Bit reader: skip past end")
        self._bitpos += n


class BitWriterMSB:
    """MSB-first bit writer (QOA encoder's u64-word output, test fixtures)."""

    __slots__ = ("_bytes", "_acc", "_nacc")

    def __init__(self):
        self._bytes = bytearray()
        self._acc = 0
        self._nacc = 0

    def write(self, value: int, n: int) -> None:
        self._acc = (self._acc << n) | (value & ((1 << n) - 1))
        self._nacc += n
        while self._nacc >= 8:
            self._nacc -= 8
            self._bytes.append((self._acc >> self._nacc) & 0xFF)
        self._acc &= (1 << self._nacc) - 1

    def align_to_byte(self) -> None:
        if self._nacc:
            self.write(0, 8 - self._nacc)

    def getvalue(self) -> bytes:
        assert self._nacc == 0, "unaligned bit writer"
        return bytes(self._bytes)


class BitWriterLSB:
    """LSB-first bit writer (Vorbis fixture generation)."""

    __slots__ = ("_bytes", "_acc", "_nacc")

    def __init__(self):
        self._bytes = bytearray()
        self._acc = 0
        self._nacc = 0

    def write(self, value: int, n: int) -> None:
        self._acc |= (value & ((1 << n) - 1)) << self._nacc
        self._nacc += n
        while self._nacc >= 8:
            self._bytes.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nacc -= 8

    def align_to_byte(self) -> None:
        if self._nacc:
            self._bytes.append(self._acc & 0xFF)
            self._acc = 0
            self._nacc = 0

    def getvalue(self) -> bytes:
        out = bytearray(self._bytes)
        if self._nacc:
            out.append(self._acc & 0xFF)
        return bytes(out)
