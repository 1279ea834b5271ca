"""Vorbis decode vs real libvorbis streams (test-only oracle).

The from-spec fixtures in test_vorbis.py validate structure; these tests
validate against the REAL encoder (psychoacoustics, block switching,
residue coupling at every quality) and libvorbis's own synthesis as ground
truth.  Parity contract: <=1e-4 max-abs (SURVEY.md §4); observed ~3e-7.
Skipped when the system libvorbis/libvorbisenc are absent.
"""

import numpy as np
import pytest

from audio_formats_tpu.io import ogg as aogg

from golden import vorbis_oracle as VO


def _have():
    try:
        return VO.get_libs() is not None
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _have(),
                                reason="system libvorbis unavailable")


def _mux(headers, audio):
    serial = 0x5157
    pages = [aogg.build_page([headers[0]], serial, 0, 0, bos=True),
             aogg.build_page(headers[1:3], serial, 1, 0)]
    seq = 2
    pend = []
    for i, (p, g) in enumerate(audio):
        pend.append(p)
        if len(pend) == 8 or i == len(audio) - 1:
            pages.append(aogg.build_page(pend, serial, seq, g,
                                         eos=(i == len(audio) - 1)))
            pend = []
            seq += 1
    return b"".join(pages)


def _signal(n, rate, channels, kind, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    if kind == "tone":
        base = 0.4 * np.sin(2 * np.pi * 440 * t) + \
            0.02 * rng.standard_normal(n)
    elif kind == "sweep":
        base = 0.4 * np.sin(2 * np.pi * (200 + 4000 * t) * t)
    else:  # transient: impulses force short-block switching
        base = np.zeros(n)
        for p in range(0, n, 2048):
            base[p : p + 64] += np.hanning(64) * rng.uniform(0.2, 0.9)
        base += 0.01 * rng.standard_normal(n)
    if channels == 2:
        return np.stack([base, 0.3 * np.sin(2 * np.pi * 523 * t) +
                         0.02 * rng.standard_normal(n)], 1).astype(np.float32)
    return base[:, None].astype(np.float32)


@pytest.mark.parametrize("rate,channels,quality,kind", [
    (44100, 2, 0.4, "tone"),
    (44100, 1, 0.1, "sweep"),
    (44100, 2, 0.8, "transient"),
    (48000, 2, 0.2, "tone"),
    (8000, 1, 0.4, "tone"),
])
def test_real_vorbis_stream(rate, channels, quality, kind):
    import audio_formats_tpu as af

    pcm = _signal(rate, rate, channels, kind, seed=hash((rate, kind)) & 127)
    headers, audio = VO.encode(pcm, rate, quality)
    ref = VO.decode(headers, audio, channels)
    data = _mux(headers, audio)
    st = af.AudioStream()
    st.open_from_memory(data)
    assert st.get_num_channels() == channels
    assert st.get_samplerate() == float(rate)
    n = st.get_length_in_frames()
    mine = st.read_samples_float(n)
    m = min(len(mine), len(ref))
    assert m >= pcm.shape[0] - 2048
    assert float(np.abs(mine[:m] - ref[:m]).max()) < 1e-4


def test_real_vorbis_seek():
    import audio_formats_tpu as af

    pcm = _signal(44100 * 2, 44100, 2, "tone", seed=3)
    headers, audio = VO.encode(pcm, 44100, 0.4)
    data = _mux(headers, audio)
    st = af.AudioStream()
    st.open_from_memory(data)
    n = st.get_length_in_frames()
    full = st.read_samples_float(n)
    st.seek_position(30011)
    chunk = st.read_samples_float(2000)
    assert np.allclose(chunk, full[30011:32011], atol=1e-6)
