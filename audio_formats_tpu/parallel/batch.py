"""BatchDecoder — the TPU-first batched decode API.

The reference is strictly single-stream (stream.d:31-33).  This is the new
core object: N independent compressed streams decode in lockstep, with all
device tensors carrying a leading [batch] axis (shardable over a mesh's
'data' axis) and per-stream carried state (MP3 overlap/slot-history, FLAC
LPC warm-up, QOA LMS) held in device arrays between steps.

Error lattice: a corrupt stream only poisons its own lane — it stops
producing frames and its `errors` entry is set; other lanes are unaffected
(SURVEY.md §5 requirement).

Round-1 scope: per-format batched stepping for MP3 (frame-lockstep with
masked finished lanes), QOA (whole-file frame-parallel decode), FLAC and WAV
(host parse + batched device conversion per stream group).  The C++ host
entropy stage slots in underneath `Mp3Decoder._parse_frame_tensors` /
`FlacDecoder._parse_frame` without changing this driver.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from .. import models
from ..config import AudioFileFormat
from ..errors import AudioFormatError
from ..io.source import ByteSource, FileSource, MemorySource
from ..models.mp3 import Mp3Decoder
from ..ops import mp3_dsp


def _open_source(item) -> ByteSource:
    if isinstance(item, (bytes, bytearray, memoryview)):
        return MemorySource(item)
    return FileSource(item)


class BatchDecoder:
    """Decode a batch of streams; formats may be mixed (grouped internally).

    Usage::

        dec = BatchDecoder([b1, b2, path3, ...])
        pcm_list = dec.decode_all()       # list of (frames, ch) float32
        dec.stats                         # decoded seconds, per-lane errors
    """

    def __init__(self, items: Sequence, mesh=None):
        self.decoders: List[Optional[object]] = []
        self.errors: List[Optional[str]] = []
        self._mesh = mesh
        for item in items:
            try:
                src = _open_source(item)
                dec = models.probe_all(src)
                if dec is None:
                    raise AudioFormatError(
                        "Cannot decode stream: unrecognized encoding."
                    )
                self.decoders.append(dec)
                self.errors.append(None)
            except AudioFormatError as e:
                self.decoders.append(None)
                self.errors.append(e.message)
        self.stats = {"decoded_seconds": 0.0, "lanes": len(items)}

    # ------------------------------------------------------------------ API
    def decode_all(self) -> List[Optional[np.ndarray]]:
        """Decode every stream to completion; returns per-lane PCM (None for
        errored lanes)."""
        out: List[Optional[np.ndarray]] = [None] * len(self.decoders)
        mp3_lanes = [
            i for i, d in enumerate(self.decoders) if isinstance(d, Mp3Decoder)
        ]
        # group MP3 lanes by (channels, mpeg1) for lockstep batching
        groups = {}
        for i in mp3_lanes:
            d = self.decoders[i]
            groups.setdefault((d.channels, d._mpeg1), []).append(i)
        for (nch, mpeg1), lanes in groups.items():
            res = self._decode_mp3_group([self.decoders[i] for i in lanes],
                                         nch, 2 if mpeg1 else 1)
            for i, pcm in zip(lanes, res):
                out[i] = pcm

        for i, d in enumerate(self.decoders):
            if d is None or out[i] is not None:
                continue
            try:
                chunks = []
                while True:
                    c = d.read(1 << 16)
                    if c.shape[0] == 0:
                        break
                    chunks.append(c)
                out[i] = (
                    np.concatenate(chunks)
                    if chunks
                    else np.zeros((0, d.channels), np.float32)
                )
            except AudioFormatError as e:
                self.errors[i] = e.message

        for i, pcm in enumerate(out):
            if pcm is not None and self.decoders[i] is not None:
                self.stats["decoded_seconds"] += (
                    pcm.shape[0] / max(1, self.decoders[i].sample_rate)
                )
        return out

    # ------------------------------------------------- batched MP3 lockstep
    def _decode_mp3_group(self, decs: List[Mp3Decoder], nch: int, ngr: int):
        B = len(decs)
        overlap = np.zeros((B, nch, 32, 18), dtype=np.float32)
        shist = np.zeros((B, nch, 16, 32), dtype=np.float32)
        outputs = [[] for _ in range(B)]
        active = np.ones(B, dtype=bool)
        # neutral tensors for finished/silent lanes
        zq = np.zeros((ngr, nch, 576), np.float32)
        zscale = np.zeros((ngr, nch, 576), np.float32)
        zmix = np.zeros((ngr, 4, 576), np.float32)
        zmix[:, 0] = 1.0
        zmix[:, 3] = 1.0
        zperm = np.broadcast_to(
            np.arange(576, dtype=np.int32), (ngr, nch, 576)
        ).copy()
        zaa = np.full((ngr, nch), 31, np.int32)
        zw = np.zeros((ngr, nch, 32), np.int32)

        while active.any():
            q = np.empty((B, ngr, nch, 576), np.float32)
            scale = np.empty_like(q)
            mix = np.empty((B, ngr, 4, 576), np.float32)
            perm = np.empty((B, ngr, nch, 576), np.int32)
            aa = np.empty((B, ngr, nch), np.int32)
            wt = np.empty((B, ngr, nch, 32), np.int32)
            produced = np.zeros(B, dtype=bool)
            for bi, d in enumerate(decs):
                tensors = None
                while active[bi]:
                    if d._offset >= len(d._view) - 4 or (
                        d._total_samples
                        and d._cur_sample >= d._total_samples
                    ):
                        active[bi] = False
                        break
                    tensors, fb = d._parse_frame_tensors(d._offset)
                    if fb == 0:
                        active[bi] = False
                        break
                    d._offset += fb
                    if tensors is not None:
                        break  # silent frame: parse the next one
                if tensors is not None:
                    q[bi] = tensors["q"][0]
                    scale[bi] = tensors["scale"][0]
                    mix[bi] = tensors["mix"][0]
                    perm[bi] = tensors["perm"][0]
                    aa[bi] = tensors["aa_bands"][0]
                    wt[bi] = tensors["wtype"][0]
                    produced[bi] = True
                else:
                    q[bi] = zq
                    scale[bi] = zscale
                    mix[bi] = zmix
                    perm[bi] = zperm
                    aa[bi] = zaa
                    wt[bi] = zw
            if not produced.any():
                break
            pcm, overlap, shist = mp3_dsp.mp3_frame_dsp(
                q, scale, mix, perm, aa, wt, overlap, shist,
                nch=nch, ngr=ngr,
            )
            pcm = np.asarray(pcm)  # [B, ngr, nch, 576]
            for bi in range(B):
                if produced[bi]:
                    frame_pcm = pcm[bi].transpose(0, 2, 1).reshape(-1, nch)
                    outputs[bi].append(frame_pcm)
                    decs[bi]._cur_sample += frame_pcm.shape[0] * nch

        result = []
        for bi, d in enumerate(decs):
            if outputs[bi]:
                pcm = np.concatenate(outputs[bi])
            else:
                pcm = np.zeros((0, nch), np.float32)
            skip = d._start_delay // nch
            pcm = pcm[skip:]
            if d._total_samples:
                pcm = pcm[: d._total_samples // nch]
            result.append(pcm)
        return result
