"""Golden WAV model — an independent, double-precision implementation of the
reference's WAV numeric semantics (wav.d), used to verify the framework.

This module deliberately shares no code with audio_formats_tpu: files are
built/parsed with struct/numpy in the most literal way possible.
"""

from __future__ import annotations

import struct

import numpy as np


def build_wav(pcm_bytes: bytes, *, fmt_tag: int, channels: int,
              sample_rate: int, bits: int, extensible: bool = False,
              extra_chunks=()) -> bytes:
    """Assemble a RIFF/WAVE file from raw sample bytes."""
    bps = bits // 8
    block_align = bps * channels
    byte_rate = sample_rate * block_align
    if extensible:
        if fmt_tag == 3:
            guid = bytes([3, 0, 0, 0, 0, 0, 16, 0, 128, 0, 0, 170, 0, 56, 155, 113])
        else:
            guid = bytes([1, 0, 0, 0, 0, 0, 16, 0, 128, 0, 0, 170, 0, 56, 155, 113])
        fmt_body = struct.pack(
            "<HHIIHHHHI", 0xFFFE, channels, sample_rate, byte_rate,
            block_align, bits, 22, bits, 0,
        ) + guid
    else:
        fmt_body = struct.pack(
            "<HHIIHH", fmt_tag, channels, sample_rate, byte_rate,
            block_align, bits,
        )
    chunks = [(b"fmt ", fmt_body)]
    chunks.extend(extra_chunks)
    chunks.append((b"data", pcm_bytes))
    body = b"WAVE"
    for cid, cbody in chunks:
        body += cid + struct.pack("<I", len(cbody)) + cbody
        if len(cbody) & 1:
            body += b"\0"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def pack_pcm(ints: np.ndarray, bits: int) -> bytes:
    """Pack integer samples (u8 raw 0..255, else signed) little-endian."""
    if bits == 8:
        return ints.astype(np.uint8).tobytes()
    if bits == 16:
        return ints.astype("<i2").tobytes()
    if bits == 24:
        u = ints.astype(np.int32).view(np.uint32)
        out = np.empty((len(ints), 3), np.uint8)
        out[:, 0] = u & 0xFF
        out[:, 1] = (u >> 8) & 0xFF
        out[:, 2] = (u >> 16) & 0xFF
        return out.tobytes()
    if bits == 32:
        return ints.astype("<i4").tobytes()
    raise ValueError(bits)


def decode_ints_to_f32(ints: np.ndarray, bits: int) -> np.ndarray:
    """Reference decode scaling (wav.d:297-330), double math then f32."""
    x = ints.astype(np.float64)
    if bits == 8:
        return ((x - 128.0) / 127.0).astype(np.float32)
    scale = {16: 32767.0, 24: 8388607.0, 32: 2147483648.0}[bits]
    return (x / scale).astype(np.float32)


def quantize_f64(x: np.ndarray, bits: int) -> np.ndarray:
    """Reference no-dither quantization (wav.d:487-525), double math.
    Returns signed ints (u8 case returns value-128)."""
    scale = {8: 127.0, 16: 32767.0, 24: 8388607.0}[bits]
    xd = np.clip(x.astype(np.float64), -1.0, 1.0)
    return np.floor(xd * scale + 0.5).astype(np.int64).clip(
        -int(scale), int(scale)
    ).astype(np.int32)


def parse_wav(data: bytes):
    """Minimal independent RIFF parser; returns (fmt_tag, ch, rate, bits,
    raw_sample_bytes)."""
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)
    tag, ch, rate, _br, _ba, bits = fmt
    return tag, ch, rate, bits, pcm


def unpack_pcm(raw: bytes, bits: int) -> np.ndarray:
    if bits == 8:
        return np.frombuffer(raw, np.uint8).astype(np.int32)
    if bits == 16:
        return np.frombuffer(raw, "<i2").astype(np.int32)
    if bits == 24:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        return (v << 8) >> 8
    if bits == 32:
        return np.frombuffer(raw, "<i4").astype(np.int32)
    raise ValueError(bits)
