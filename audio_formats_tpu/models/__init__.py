"""Codec registry and probe cascade.

The decode probe order matches stream.d:1586-1838:
Opus → FLAC → WAV → QOA → OGG(Vorbis) → MP3 → XM → MOD.
Each probe receives the source rewound to byte 0 and returns a decoder or
None; probes must not raise for "not my format" (only for genuinely corrupt
streams of their own format, once committed by magic bytes).
"""

from __future__ import annotations

from typing import Optional

from ..config import AudioFileFormat, EncodingOptions
from ..io.source import ByteSink, ByteSource

from . import wav as _wav
from . import qoa as _qoa


def _probe_order():
    # Priority order per stream.d:1586-1838; entries appear as codecs land.
    from . import flac as _flac
    from . import vorbis as _vorbis
    from . import mp3 as _mp3
    from . import opus as _opus
    from . import xm as _xm
    from . import mod as _mod

    return (
        _opus.probe,
        _flac.probe,
        _wav.probe,
        _qoa.probe,
        _vorbis.probe,
        _mp3.probe,
        _xm.probe,
        _mod.probe,
    )


def probe_all(src: ByteSource):
    for probe in _probe_order():
        src.seek(0)
        dec = probe(src)
        if dec is not None:
            return dec
    return None


def make_encoder(
    format: AudioFileFormat,
    sink: ByteSink,
    sample_rate: int,
    channels: int,
    options: EncodingOptions,
):
    if format == AudioFileFormat.wav:
        return _wav.WavEncoder(sink, sample_rate, channels, options)
    if format == AudioFileFormat.qoa:
        return _qoa.QoaEncoder(sink, sample_rate, channels, options)
    return None
