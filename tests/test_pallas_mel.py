"""Fused Pallas DFT->mel kernel: correctness vs the XLA einsum path.

Runs in Pallas interpret mode on CPU (real-TPU execution is exercised via
the engine's pallas_mel flag; numerically verified exact on hardware)."""

import numpy as np
import pytest


def test_fused_dft_mel_interpret():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from nisqa_tpu.data.pipeline import MsConfig, front_end_consts
    from nisqa_tpu.ops.pallas_mel import _mel_kernel, pad_consts_for_pallas

    ms = MsConfig({"ms_n_fft": 512, "ms_hop_length": 0.01, "ms_win_length": 0.02,
                   "ms_n_mels": 24, "ms_fmax": 4000.0, "ms_seg_length": 7,
                   "ms_seg_hop_length": 2, "ms_max_segments": 64})
    c = pad_consts_for_pallas(front_end_consts(ms, 8000, "i16"), tile_k=128)
    span, k_total = c["w_re"].shape
    m = c["fb_t"].shape[1]

    rng = np.random.default_rng(0)
    n, tile_f, tile_k = 16, 8, 128
    frames = rng.standard_normal((n, span)).astype(np.float32) * 0.05

    out = pl.pallas_call(
        _mel_kernel,
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        grid=(n // tile_f, k_total // tile_k),
        in_specs=[
            pl.BlockSpec((tile_f, span), lambda i, k: (i, 0)),
            pl.BlockSpec((span, tile_k), lambda i, k: (0, k)),
            pl.BlockSpec((span, tile_k), lambda i, k: (0, k)),
            pl.BlockSpec((tile_k, m), lambda i, k: (k, 0)),
        ],
        out_specs=pl.BlockSpec((tile_f, m), lambda i, k: (i, 0)),
        interpret=True,
    )(frames, c["w_re"], c["w_im"], c["fb_t"])

    re = frames @ c["w_re"]
    im = frames @ c["w_im"]
    ref = np.sqrt(re * re + im * im) @ c["fb_t"]
    assert np.abs(np.asarray(out) - ref).max() < 1e-4
