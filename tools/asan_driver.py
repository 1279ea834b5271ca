"""jax-free driver for the ASan pass (tools/native_sanitize.sh AF_SAN=asan).

AddressSanitizer's preloaded runtime is incompatible with jaxlib's own
C++ exception machinery, so the ASan variant cannot run the pytest A/B
suite.  This driver imports ONLY numpy + ctypes and pushes golden
fixture streams (and corrupt mutations of them) through every C entry
point — ASan/UBSan then check the memory behavior of the full native
entropy surface: MP3 window parse (classic + packed), frame indexing,
FLAC frame parse / width scan / bit packing.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np

from audio_formats_tpu.host import native
from golden import flac_ref, mp3_ref

lib = native.get_lib()
assert lib is not None, "native lib failed to build"
rng = np.random.default_rng(0)


def frames_for(n, channels):
    frames = []
    for i in range(n):
        grs = []
        for g in range(2):
            q = np.zeros(576, np.int64)
            idx = rng.choice(500, 60, replace=False)
            q[idx] = rng.integers(-80, 81, 60)
            ch = [{"q": q, "block_type": 0, "global_gain": 214}]
            if channels == 2:
                ch.append(dict(ch[0]))
            grs.append(ch)
        frames.append(grs)
    return frames


def drive_mp3(data, channels):
    view = memoryview(data)
    hdr0 = bytes(data[:4])
    W, ngr, nch = 8, 2, channels
    NL = W * ngr * nch
    state = (np.zeros(511, np.uint8), np.zeros(1, np.int32),
             np.zeros((2, 40), np.int32))
    bits = np.empty((NL, native.LANE_WORDS), np.uint32)
    meta = np.zeros((NL, 16), np.int32)
    scfq = np.zeros((NL, 40), np.int16)
    aa = np.zeros((W * ngr, nch), np.int32)
    wt = np.zeros((W * ngr, nch, 32), np.int32)
    flags = np.zeros(W, np.uint8)
    off = 0
    for _ in range(6):
        n, off, mw, ist = native.mp3_parse_window_packed(
            lib, view, off, hdr0, W, ngr, nch, state,
            bits, meta, scfq, aa, wt, flags)
        if n == 0:
            break
    st = np.array([0, 0, 0, 0], np.int64)
    bo = np.empty(4096, np.int64)
    bs = np.empty(4096, np.int64)
    native.mp3_index(lib, view, hdr0, 0, 3, 1152 * nch, st, bo, bs)


def drive_flac(data):
    view = memoryview(data)
    import ctypes
    # find first frame after metadata (search for sync)
    start = data.find(b"\xff\xf8")
    bit = start * 8
    for _ in range(8):
        r = native.flac_parse_frame(lib, view, bit, 16, 2, 65535)
        if r is None:
            break
        bit = r["end_bits"]
        res = np.ascontiguousarray(r["residual"].astype(np.int32))
        L, n = res.shape
        n32 = ((n + 31) // 32) * 32
        resp = np.zeros((L, n32), np.int32)
        resp[:, :n] = res
        order = np.ascontiguousarray(r["order"].astype(np.int32))
        w_l = np.zeros(L, np.int32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        wmax = lib.af_flac_widths(resp.ctypes.data_as(i32p), L, n32,
                                  order.ctypes.data_as(i32p),
                                  w_l.ctypes.data_as(i32p))
        wb = max(1, min(32, int(wmax)))
        stride = (n32 * wb + 31) // 32 + 1
        packed = np.empty((L, stride), np.uint32)
        lib.af_flac_pack(resp.ctypes.data_as(i32p), L, n32,
                         order.ctypes.data_as(i32p), wb,
                         packed.ctypes.data_as(u32p), stride)


def drive_threaded():
    """Concurrent host-stage calls: the batch scheduler parses window t+1
    on the main thread while a worker uploads/packs window t, so the C
    stage must be reentrant across threads (per-call state only).  TSAN
    (AF_SAN=tsan) checks this interleaving."""
    import threading

    datas = [mp3_ref.build_mp3(frames_for(12, ch), channels=ch)
             for ch in (1, 2)]
    errs = []

    def work(d, ch):
        try:
            for _ in range(4):
                drive_mp3(d, ch)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=work, args=(d, ch))
          for d, ch in zip(datas, (1, 2))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs


for ch in (1, 2):
    data = mp3_ref.build_mp3(frames_for(16, ch), channels=ch)
    drive_mp3(data, ch)
    # corrupt mutations: truncations and byte flips must not crash C
    for cut in (len(data) // 3, len(data) - 7):
        drive_mp3(data[:cut], ch)
    bad = bytearray(data)
    for pos in rng.integers(4, len(bad), 64):
        bad[pos] ^= 0xFF
    drive_mp3(bytes(bad), ch)

t = np.arange(20000)[:, None]
pcm = np.clip(np.round(9000 * np.sin(2 * np.pi * 300 * t * [1, 1.4] / 44100)
                       + 300 * rng.standard_normal((20000, 2))),
              -32768, 32767).astype(np.int64)
fd = flac_ref.build_flac(pcm, 44100, 16, block_size=1024,
                         stereo_mode="mid_side", modes=["lpc8", "fixed3"])
drive_flac(fd)
bad = bytearray(fd)
for pos in rng.integers(200, len(bad), 64):
    bad[pos] ^= 0xFF
drive_flac(bytes(bad))
drive_threaded()
print("asan driver OK")
