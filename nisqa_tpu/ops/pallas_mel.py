"""Pallas TPU kernel: fused windowed-DFT magnitude -> mel projection.

The XLA formulation (nisqa_tpu/data/pipeline._front_end) materialises the
re/im DFT responses (frames x kept_bins, ~2 x 230 MB at the largest bucket)
in HBM between three einsums. This kernel keeps them in VMEM: for each
frame tile it accumulates  mel += |frames @ W_re[kt] + i * frames @ W_im[kt]|
@ fb[kt]  over DFT-bin tiles, so only frames (in) and mel (out) touch HBM —
an ~8x HBM-traffic reduction for the front-end on direct-attached hardware.

Grid: (frame_tiles, k_tiles); the output block is revisited across the k
dimension and used as the accumulator (standard TPU Pallas reduction
pattern). All tensors arrive as arguments — no embedded constants (see
docs/RELAY_NOTES.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mel_kernel(frames_ref, w_re_ref, w_im_ref, fb_ref, out_ref, *, bf16=False):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    f = frames_ref[:]  # (tile_f, span)
    wr, wi = w_re_ref[:], w_im_ref[:]
    if bf16:
        # fast mode: single-pass bf16 MXU matmuls with f32 accumulation;
        # parity bound measured in BASELINE.md, opt-in via
        # InferenceEngine(fe_precision='fast'). The DEFAULT precision must
        # be pinned explicitly: an inherited fp32 contract precision on
        # bf16 operands is rejected by Mosaic ("Bad lhs type").
        f, wr, wi = (a.astype(jnp.bfloat16) for a in (f, wr, wi))
        prec = jax.lax.Precision.DEFAULT
    else:
        # exact mode: the f32 multi-pass contraction must be PINNED, not
        # inherited — the serving engine wraps the whole pass in
        # default_matmul_precision('default'), under which an unpinned f32
        # dot truncates to one bf16 pass on the MXU. Round-3 finding: this
        # made 'exact' silently equal 'fast' on TPU (measured identical
        # outputs over 384 files) until pinned here.
        prec = jax.lax.Precision.HIGHEST
    re = jnp.dot(f, wr, preferred_element_type=jnp.float32, precision=prec)
    im = jnp.dot(f, wi, preferred_element_type=jnp.float32, precision=prec)
    mag = jnp.sqrt(re * re + im * im)  # (tile_f, tile_k)
    # the mel projection is f32 x f32 in both modes; pin HIGHEST to mirror
    # the XLA einsum path (pipeline._front_end), which always does
    out_ref[:] += jnp.dot(mag, fb_ref[:], preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)


def fused_dft_mel(frames, w_re, w_im, fb_kt, tile_f: int | None = None,
                  tile_k: int | None = None, vmem_budget: int = 8 << 20,
                  bf16: bool = False, interpret: bool | None = None):
    """frames: (N, span) f32; w_re/w_im: (span, K); fb_kt: (K, M).

    Returns mel (N, M) f32 == |frames @ (w_re + i w_im)| @ fb_kt.
    N must be a multiple of 8; K a multiple of 128 (pad with zero columns);
    M <= 128 recommended (one lane tile). ``bf16`` switches the DFT matmuls
    to single-pass bf16 (f32 accumulation) — the engine's fast front-end.
    ``interpret=None`` auto-selects Pallas interpret mode on non-TPU
    backends, so the kernel path (incl. its shard_map wrap under a mesh)
    is testable on the forced-CPU virtual-device test rig.

    Tile sizes auto-shrink to fit ``vmem_budget`` (double-buffered blocks +
    headroom for the output, which XLA may also place in VMEM): large spans
    (e.g. the 48 kHz / 20 ms window = 1440 samples) blow the 16 MB scoped
    VMEM limit at the 256x512 default, observed on the TTS geometry.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, span = frames.shape
    k_total = w_re.shape[1]
    m = fb_kt.shape[1]

    if tile_f is None or tile_k is None:
        tile_f, tile_k = 256, 512

        def est(tf, tk):
            # double-buffered VMEM bytes of all blocks
            return 2 * 4 * (tf * span + 2 * span * tk + tk * m + tf * m)

        while est(tile_f, tile_k) > vmem_budget and tile_k > 128:
            tile_k //= 2
        while est(tile_f, tile_k) > vmem_budget and tile_f > 64:
            tile_f //= 2
    assert k_total % tile_k == 0, "pad DFT bins to a tile_k multiple"
    grid = (pl.cdiv(n, tile_f), k_total // tile_k)

    from functools import partial

    return pl.pallas_call(
        partial(_mel_kernel, bf16=bf16),
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_f, span), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((span, tile_k), lambda i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((span, tile_k), lambda i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, m), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_f, m), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(frames, w_re, w_im, fb_kt)


def pad_consts_for_pallas(consts: dict, tile_k: int = 512) -> dict:
    """Zero-pad the DFT/mel tensors so kept_bins % tile_k == 0 (zero columns
    contribute |0| * 0 to the mel accumulation)."""
    w_re, w_im, fb_t = consts["w_re"], consts["w_im"], consts["fb_t"]
    k = w_re.shape[1]
    k_pad = -(-k // tile_k) * tile_k - k
    if k_pad:
        zw = np.zeros((w_re.shape[0], k_pad), np.float32)
        zf = np.zeros((k_pad, fb_t.shape[1]), np.float32)
        w_re = np.concatenate([w_re, zw], axis=1)
        w_im = np.concatenate([w_im, zw], axis=1)
        fb_t = np.concatenate([fb_t, zf], axis=0)
    return {"w_re": w_re, "w_im": w_im, "fb_t": fb_t}
