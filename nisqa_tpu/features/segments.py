"""Mel-spectrogram segment windowing.

Reproduces `segment_specs` (`/root/reference/nisqa/NISQA_lib.py:2239-2282`):
a width-``seg_length`` (odd) window slides over the mel frames; the number of
full windows is ``n_wins_full = W - (seg_length - 1)``; windows are then
subsampled by ``seg_hop`` giving ``n_wins = ceil(n_wins_full / seg_hop)`` and
zero-padded to ``max_length``.

TPU design: the reference gathers per file on the host; here the whole batch
is segmented on-device with one static gather. Window starts beyond the valid
range gather clipped indices and are zeroed, matching the reference's
zero-padding exactly (pad windows are all-zero).

Layout: the reference produces (T, 1, H=n_mels, W=seg_length) NCHW per file
(`NISQA_lib.py:2266-2269`); we keep the TPU-friendly NHWC-style
(B, T, n_mels, seg_length) and add the channel axis inside the model.
"""

from __future__ import annotations

import numpy as np


def n_wins_for(n_frames: int, seg_length: int, seg_hop: int) -> int:
    """Valid window count for a spectrogram with ``n_frames`` frames."""
    full = n_frames - (seg_length - 1)
    if full < 1:
        raise ValueError(
            f"Sample too short: only {n_frames} frames for seg_length={seg_length}"
        )
    return int(np.ceil(full / seg_hop)) if seg_hop > 1 else int(full)


def segment_np(spec: np.ndarray, seg_length: int, seg_hop: int, max_length: int):
    """Host reference segmentation. spec: (n_mels, W) -> (max_length, n_mels, seg_length)."""
    if seg_length % 2 == 0:
        raise ValueError(f"seg_length must be odd! (seg_length={seg_length})")
    n_mels, W = spec.shape
    n_wins = n_wins_for(W, seg_length, seg_hop)
    if max_length < n_wins:
        raise ValueError(f"n_wins {n_wins} > max_length {max_length}")
    out = np.zeros((max_length, n_mels, seg_length), dtype=np.float32)
    for t in range(n_wins):
        s = t * seg_hop
        out[t] = spec[:, s : s + seg_length]
    return out, n_wins


def make_segment_fn(seg_length: int, seg_hop: int, max_length: int, n_frames_max: int):
    """Build a jittable batched segmenter.

    Returns ``fn(spec (B, W, n_mels), n_frames (B,)) ->
    (segments (B, max_length, n_mels, seg_length), n_wins (B,))``.
    """
    import jax
    import jax.numpy as jnp

    if seg_length % 2 == 0:
        raise ValueError(f"seg_length must be odd! (seg_length={seg_length})")

    starts = np.arange(max_length) * seg_hop  # (T,)
    win = np.arange(seg_length)  # (S,)
    gather_idx = np.minimum(starts[:, None] + win[None, :], n_frames_max - 1)  # (T, S)

    def fn(spec, n_frames):
        idx = jnp.asarray(gather_idx)
        segs = spec[:, idx, :]  # (B, T, S, M)
        segs = jnp.swapaxes(segs, 2, 3)  # (B, T, M, S)

        full = n_frames - (seg_length - 1)
        n_wins = jnp.where(seg_hop > 1, -(-full // seg_hop), full).astype(jnp.int32)
        t_idx = jnp.arange(max_length, dtype=jnp.int32)[None, :]
        mask = t_idx < n_wins[:, None]  # (B, T)
        segs = jnp.where(mask[:, :, None, None], segs, 0.0)
        return segs, n_wins

    return jax.jit(fn)
