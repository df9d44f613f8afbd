"""Batched TPU inference engine: wav -> mel -> segments -> model, one jit.

The reference computes one spectrogram per file on the CPU inside DataLoader
worker processes and only runs the net on the accelerator
(`/root/reference/nisqa/NISQA_lib.py:1420-1467`, `:2284-2331`). Here the
entire feature pipeline runs on-device in the same XLA program as the model:

  host threads: wav decode + reflect-pad into fixed buffers  (I/O bound)
  device      : framing -> rFFT -> mel matmul -> dB -> segment gather
                -> CNN -> self-attention -> pooling            (one jit)

Static-shape design: files are grouped by (sample_rate, length bucket); each
group gets one compiled executable. Length bucketing (T in {max/8, max/4,
max/2, max} segments) avoids padding every clip to 52 s. Batches shard over
the 'data' axis of an optional `jax.sharding.Mesh`.
"""

from __future__ import annotations

import math
import os
from concurrent.futures import ThreadPoolExecutor
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..audio import wav as wavio
from ..audio.filters import mel_filterbank, padded_window
from ..audio.melspec import pad_audio_for_batch


class MsConfig:
    """Mel-spectrogram + segmentation geometry (reference ms_* args)."""

    def __init__(self, args: dict):
        self.sr = args.get("ms_sr")  # None = native rate
        self.fmax = float(args.get("ms_fmax", 20000.0))
        self.n_fft = int(args.get("ms_n_fft", 4096))
        self.hop_s = float(args.get("ms_hop_length", 0.01))
        self.win_s = float(args.get("ms_win_length", 0.02))
        self.n_mels = int(args.get("ms_n_mels", 48))
        self.seg_length = int(args.get("ms_seg_length", 15))
        self.seg_hop = int(args.get("ms_seg_hop_length", 1))
        self.max_segments = int(args.get("ms_max_segments") or 1300)
        self.channel = args.get("ms_channel")
        if self.seg_length % 2 == 0:
            raise ValueError(f"seg_length must be odd! (seg_length={self.seg_length})")

    def buckets(self):
        m = self.max_segments
        out = sorted({max(8, math.ceil(m / 8)), math.ceil(m / 4), math.ceil(m / 2), m})
        return out

    def frames_for_bucket(self, t_bucket: int) -> int:
        return (t_bucket - 1) * self.seg_hop + self.seg_length

    def n_frames(self, n_samples: int, sr: int) -> int:
        return 1 + n_samples // int(sr * self.hop_s)

    def n_wins(self, n_frames: int) -> int:
        full = n_frames - (self.seg_length - 1)
        if full < 1:
            raise ValueError(
                f"Sample too short: {n_frames} frames < seg_length {self.seg_length}"
            )
        return math.ceil(full / self.seg_hop)


def _front_end(ms: MsConfig, sr: int, t_bucket: int, frame_chunk: int = 256):
    """Build the traced front-end: (audio_buf, n_samples) -> (segs, n_wins).

    Returns (fn, buf_len). Everything is static-shape; see
    nisqa_tpu/audio/melspec.py for the math/parity notes.
    """
    hop = int(sr * ms.hop_s)
    win = int(sr * ms.win_s)
    n_frames_max = ms.frames_for_bucket(t_bucket)
    fb_t = jnp.asarray(mel_filterbank(int(sr), ms.n_fft, ms.n_mels, 0.0, ms.fmax).T)
    window = jnp.asarray(padded_window(win, ms.n_fft))

    n_chunks = -(-n_frames_max // frame_chunk)
    frames_padded = n_chunks * frame_chunk
    span = (frame_chunk - 1) * hop + ms.n_fft
    buf_len = (frames_padded - 1) * hop + ms.n_fft
    local_idx = jnp.asarray(
        np.arange(frame_chunk)[:, None] * hop + np.arange(ms.n_fft)[None, :]
    )

    seg_starts = np.arange(t_bucket) * ms.seg_hop
    gather_idx = jnp.asarray(
        np.minimum(seg_starts[:, None] + np.arange(ms.seg_length)[None, :], n_frames_max - 1)
    )

    def fn(audio, n_samples):
        B = audio.shape[0]
        n_frames = (1 + n_samples // hop).astype(jnp.int32)

        def chunk(c, _):
            a = lax.dynamic_slice(audio, (0, c * (frame_chunk * hop)), (B, span))
            frames = a[:, local_idx] * window
            spec = jnp.abs(jnp.fft.rfft(frames))
            mel = jnp.einsum("bfk,km->bfm", spec, fb_t, precision=lax.Precision.HIGHEST)
            return c + 1, mel

        _, mels = lax.scan(chunk, 0, None, length=n_chunks)
        mel = jnp.moveaxis(mels, 0, 1).reshape(B, frames_padded, ms.n_mels)[:, :n_frames_max]

        db = 20.0 * jnp.log10(jnp.maximum(mel, 1e-4))
        valid = jnp.arange(n_frames_max, dtype=jnp.int32)[None, :] < n_frames[:, None]
        mx = jnp.max(jnp.where(valid[:, :, None], db, -jnp.inf), axis=(1, 2), keepdims=True)
        db = jnp.maximum(db, mx - 80.0)

        segs = db[:, gather_idx, :]  # (B, T, S, M)
        segs = jnp.swapaxes(segs, 2, 3)  # (B, T, M, S)
        full = n_frames - (ms.seg_length - 1)
        n_wins = (-(-full // ms.seg_hop) if ms.seg_hop > 1 else full).astype(jnp.int32)
        t_mask = jnp.arange(t_bucket, dtype=jnp.int32)[None, :] < n_wins[:, None]
        segs = jnp.where(t_mask[:, :, None, None], segs, 0.0)
        return segs, n_wins

    return fn, buf_len


class InferenceEngine:
    """Compiled predict pipelines keyed by (sample_rate, T bucket, batch)."""

    def __init__(self, model, params, state, ms: MsConfig, batch_size: int = 32,
                 mesh=None, num_workers: int = 8, precision: str = "default"):
        self.model = model
        self.ms = ms
        self.batch_size = int(batch_size)
        self.mesh = mesh
        self.num_workers = max(1, int(num_workers))
        # 'default' = fast TPU bf16-pass matmuls (MOS parity < 0.01 abs);
        # 'highest' = f32-accumulated passes for tightest reference parity
        self.precision = precision
        self._pipelines = {}
        self._buf_lens = {}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            self.params = jax.device_put(params, rep)
            self.state = jax.device_put(state, rep)
            self._data_sharding = NamedSharding(mesh, P("data"))
        else:
            self.params = jax.device_put(params)
            self.state = jax.device_put(state)
            self._data_sharding = None

    def update_params(self, params, state):
        """Swap in fresh params/state (e.g. per training epoch) without
        invalidating compiled pipelines."""
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            self.params = jax.device_put(params, rep)
            self.state = jax.device_put(state, rep)
        else:
            self.params = jax.device_put(params)
            self.state = jax.device_put(state)

    # -- compiled pipeline per (sr, bucket) ---------------------------------

    def _pipeline(self, sr: int, t_bucket: int):
        key = (sr, t_bucket)
        if key in self._pipelines:
            return self._pipelines[key]
        fe, buf_len = _front_end(self.ms, sr, t_bucket)
        model = self.model
        precision = self.precision

        if model.double_ended:
            def run(params, state, a_deg, n_deg, a_ref, n_ref):
                with jax.default_matmul_precision(precision):
                    segs_d, w_d = fe(a_deg, n_deg)
                    segs_r, w_r = fe(a_ref, n_ref)
                    x = jnp.stack([segs_d, segs_r], axis=2)  # (B, T, 2, M, S)
                    n_wins = jnp.stack([w_d, w_r], axis=1)
                    y, _ = model.apply(params, state, x, n_wins)
                return y
        else:
            def run(params, state, audio, n_samples):
                with jax.default_matmul_precision(precision):
                    segs, n_wins = fe(audio, n_samples)
                    y, _ = model.apply(params, state, segs, n_wins)
                return y

        jitted = jax.jit(run)
        self._pipelines[key] = jitted
        self._buf_lens[key] = buf_len
        return jitted

    # -- host side -----------------------------------------------------------

    def _bucket_for(self, n_wins: int) -> int:
        for b in self.ms.buckets():
            if n_wins <= b:
                return b
        raise ValueError(
            f"n_wins {n_wins} > max_length {self.ms.max_segments}. "
            "Increase max window length ms_max_segments!"
        )

    def _load_audio(self, path):
        y, sr = wavio.read_wav(path, channel=self.ms.channel)
        if self.ms.sr:
            y = wavio.resample_poly(y, sr, int(self.ms.sr))
            sr = int(self.ms.sr)
        return y, sr

    def predict_paths(self, paths, paths_ref=None):
        """Predict for a list of wav paths -> (N, out_dim) float32.

        Groups files by (sr, bucket), batches within groups, restores input
        order. Host decode runs in a thread pool overlapped with device work.
        """
        ms = self.ms
        N = len(paths)
        de = self.model.double_ended

        with ThreadPoolExecutor(self.num_workers) as ex:
            audio = list(ex.map(self._load_audio, paths))
            audio_ref = list(ex.map(self._load_audio, paths_ref)) if de else None

        metas = []
        for i, (y, sr) in enumerate(audio):
            nf = ms.n_frames(len(y), sr)
            nw = ms.n_wins(nf)
            if de:
                yr, sr_r = audio_ref[i]
                if sr_r != sr:
                    raise ValueError(f"deg/ref sample rates differ for item {i}")
                nw = max(nw, ms.n_wins(ms.n_frames(len(yr), sr)))
            metas.append((i, sr, self._bucket_for(nw)))

        groups = {}
        for i, sr, bucket in metas:
            groups.setdefault((sr, bucket), []).append(i)

        out = None
        pending = []
        for (sr, bucket), idxs in sorted(groups.items()):
            run = self._pipeline(sr, bucket)
            buf_len = self._buf_lens[(sr, bucket)]
            bs = self.batch_size
            for start in range(0, len(idxs), bs):
                chunk = idxs[start : start + bs]
                batch_args = self._make_batch(chunk, audio, audio_ref, buf_len, bs, de)
                y = run(self.params, self.state, *batch_args)
                pending.append((chunk, y))

        for chunk, y in pending:
            y = np.asarray(y)
            if out is None:
                out = np.zeros((N, y.shape[1]), dtype=np.float32)
            out[np.asarray(chunk)] = y[: len(chunk)]
        return out

    def _make_batch(self, chunk, audio, audio_ref, buf_len, bs, de):
        def fill(source):
            buf = np.zeros((bs, buf_len), dtype=np.float32)
            n = np.zeros((bs,), dtype=np.int32)
            for j, i in enumerate(chunk):
                y, _ = source[i]
                buf[j, : len(y) + self.ms.n_fft] = pad_audio_for_batch(y, self.ms.n_fft, len(y) + self.ms.n_fft)
                n[j] = len(y)
            if len(chunk) < bs:  # pad batch with copies of the first row
                buf[len(chunk):] = buf[0]
                n[len(chunk):] = n[0]
            return buf, n

        buf_d, n_d = fill(audio)
        args = [buf_d, n_d]
        if de:
            buf_r, n_r = fill(audio_ref)
            args += [buf_r, n_r]
        if self._data_sharding is not None:
            args = [jax.device_put(a, self._data_sharding) for a in args]
        return tuple(args)
