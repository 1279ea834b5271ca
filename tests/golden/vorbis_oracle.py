"""ctypes bindings to the system libvorbis/libvorbisenc — test-only oracle.

Used to generate REAL Vorbis streams (a proper psychoacoustic encoder, not
our from-spec fixture builder) and to decode them as ground truth, so the
framework's Vorbis decoder is validated against real-world bitstreams.
Tests skip when the libraries are absent.  The framework itself never
links these.
"""

from __future__ import annotations

import ctypes

import numpy as np


class OggPacket(ctypes.Structure):
    _fields_ = [
        ("packet", ctypes.POINTER(ctypes.c_ubyte)),
        ("bytes", ctypes.c_long),
        ("b_o_s", ctypes.c_long),
        ("e_o_s", ctypes.c_long),
        ("granulepos", ctypes.c_int64),
        ("packetno", ctypes.c_int64),
    ]


_BLOB = 8192  # opaque storage for vorbis_info/dsp_state/block/comment

_libs = None


def get_libs():
    global _libs
    if _libs is not None:
        return _libs
    try:
        lv = ctypes.CDLL("libvorbis.so.0")
        le = ctypes.CDLL("libvorbisenc.so.2")
    except OSError:
        return None
    lv.vorbis_info_init.argtypes = [ctypes.c_void_p]
    le.vorbis_encode_init_vbr.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_float
    ]
    le.vorbis_encode_init_vbr.restype = ctypes.c_int
    lv.vorbis_analysis_init.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lv.vorbis_block_init.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lv.vorbis_analysis_headerout.argtypes = [ctypes.c_void_p] * 5
    lv.vorbis_analysis_buffer.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lv.vorbis_analysis_buffer.restype = ctypes.POINTER(
        ctypes.POINTER(ctypes.c_float))
    lv.vorbis_analysis_wrote.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lv.vorbis_analysis_blockout.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lv.vorbis_analysis_blockout.restype = ctypes.c_int
    lv.vorbis_analysis.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lv.vorbis_bitrate_addblock.argtypes = [ctypes.c_void_p]
    lv.vorbis_bitrate_flushpacket.argtypes = [ctypes.c_void_p,
                                              ctypes.c_void_p]
    lv.vorbis_bitrate_flushpacket.restype = ctypes.c_int
    # decode side
    lv.vorbis_synthesis_headerin.argtypes = [ctypes.c_void_p] * 3
    lv.vorbis_synthesis_headerin.restype = ctypes.c_int
    lv.vorbis_synthesis_init.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lv.vorbis_synthesis.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lv.vorbis_synthesis.restype = ctypes.c_int
    lv.vorbis_synthesis_blockin.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lv.vorbis_synthesis_pcmout.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.POINTER(ctypes.c_float)))]
    lv.vorbis_synthesis_pcmout.restype = ctypes.c_int
    lv.vorbis_synthesis_read.argtypes = [ctypes.c_void_p, ctypes.c_int]
    _libs = (lv, le)
    return _libs


def _pkt_bytes(pkt: OggPacket) -> bytes:
    return ctypes.string_at(pkt.packet, pkt.bytes)


def encode(pcm: np.ndarray, rate=44100, quality=0.4):
    """Encode float PCM [frames, ch] -> (header_packets, audio_packets)
    where audio_packets are (bytes, granulepos)."""
    libs = get_libs()
    assert libs
    lv, le = libs
    channels = pcm.shape[1]
    vi = ctypes.create_string_buffer(_BLOB)
    vc = ctypes.create_string_buffer(_BLOB)
    vd = ctypes.create_string_buffer(_BLOB)
    vb = ctypes.create_string_buffer(_BLOB)
    lv.vorbis_info_init(vi)
    assert le.vorbis_encode_init_vbr(vi, channels, rate,
                                     ctypes.c_float(quality)) == 0
    lv.vorbis_comment_init(vc)
    assert lv.vorbis_analysis_init(vd, vi) == 0
    assert lv.vorbis_block_init(vd, vb) == 0
    hdr = OggPacket()
    hdr_comm = OggPacket()
    hdr_code = OggPacket()
    lv.vorbis_analysis_headerout(vd, vc, ctypes.byref(hdr),
                                 ctypes.byref(hdr_comm),
                                 ctypes.byref(hdr_code))
    headers = [_pkt_bytes(hdr), _pkt_bytes(hdr_comm), _pkt_bytes(hdr_code)]
    audio = []

    def drain():
        blk = ctypes.c_int(0)
        while lv.vorbis_analysis_blockout(vd, vb) == 1:
            lv.vorbis_analysis(vb, None)
            lv.vorbis_bitrate_addblock(vb)
            op = OggPacket()
            while lv.vorbis_bitrate_flushpacket(vd, ctypes.byref(op)) == 1:
                audio.append((_pkt_bytes(op), int(op.granulepos)))

    CH = 1024
    for off in range(0, pcm.shape[0], CH):
        n = min(CH, pcm.shape[0] - off)
        buf = lv.vorbis_analysis_buffer(vd, n)
        for c in range(channels):
            dst = np.ctypeslib.as_array(buf[c], shape=(n,))
            dst[:] = pcm[off : off + n, c]
        lv.vorbis_analysis_wrote(vd, n)
        drain()
    lv.vorbis_analysis_wrote(vd, 0)
    drain()
    # NOTE: structs are leaked deliberately (test process lifetime)
    return headers, audio


def decode(headers, audio_packets, channels):
    """Ground-truth decode via libvorbis synthesis; returns [frames, ch]."""
    libs = get_libs()
    assert libs
    lv, _ = libs
    vi = ctypes.create_string_buffer(_BLOB)
    vc = ctypes.create_string_buffer(_BLOB)
    vd = ctypes.create_string_buffer(_BLOB)
    vb = ctypes.create_string_buffer(_BLOB)
    lv.vorbis_info_init(vi)
    lv.vorbis_comment_init(vc)

    def mkpkt(data, no, bos=False):
        buf = (ctypes.c_ubyte * len(data)).from_buffer_copy(data)
        op = OggPacket()
        op.packet = ctypes.cast(buf, ctypes.POINTER(ctypes.c_ubyte))
        op.bytes = len(data)
        op.b_o_s = 1 if bos else 0
        op.e_o_s = 0
        op.granulepos = -1
        op.packetno = no
        return op, buf

    keep = []
    for i, h in enumerate(headers):
        op, buf = mkpkt(h, i, bos=(i == 0))
        keep.append(buf)
        assert lv.vorbis_synthesis_headerin(vi, vc, ctypes.byref(op)) == 0
    assert lv.vorbis_synthesis_init(vd, vi) == 0
    assert lv.vorbis_block_init(vd, vb) == 0
    out = []
    for i, (data, _g) in enumerate(audio_packets):
        op, buf = mkpkt(data, 3 + i)
        keep.append(buf)
        if lv.vorbis_synthesis(vb, ctypes.byref(op)) == 0:
            lv.vorbis_synthesis_blockin(vd, vb)
        pcm = ctypes.POINTER(ctypes.POINTER(ctypes.c_float))()
        n = lv.vorbis_synthesis_pcmout(vd, ctypes.byref(pcm))
        if n > 0:
            chans = [np.ctypeslib.as_array(pcm[c], shape=(n,)).copy()
                     for c in range(channels)]
            out.append(np.stack(chans, 1))
            lv.vorbis_synthesis_read(vd, n)
    return np.concatenate(out) if out else np.zeros((0, channels),
                                                    np.float32)
