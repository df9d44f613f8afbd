"""Low-level neural-net ops (functional JAX, NHWC/TPU layouts).

Parameters are plain pytrees (nested dicts of jnp arrays). Every op is an
``init(rng, ...) -> params`` / ``apply(params, x, ...)`` pair, jit/pjit/grad
friendly, with PyTorch-compatible math so the released reference checkpoints
(`/root/reference/weights/*.tar`) produce identical outputs after layout
conversion (see ``nisqa_tpu/compat``).

Key semantics reproduced from the reference stack:
  * Conv2d 'same'-ish explicit padding, weights stored HWIO (torch OIHW is
    transposed at load time).
  * BatchNorm with running stats (eval) and *masked* batch stats (train) —
    the reference runs its CNN only on valid frames via packed sequences
    (`NISQA_lib.py:489-501`); on TPU we run densely with static shapes and
    weight the statistics by the valid-segment mask, which is exactly
    equivalent (SURVEY.md §7 "Masked equivalence").
  * torch.nn.MultiheadAttention with fused QKV projection and key-padding
    mask (verified recipe: SURVEY.md Appendix A.7).
  * torch.nn.LSTM gate order (i, f, g, o), packed-sequence equivalence via
    masked lax.scan.
  * F.adaptive_max_pool2d with torch bin boundaries floor(i*In/Out) ..
    ceil((i+1)*In/Out) (verified static for the fixed 48x15 input,
    SURVEY.md Appendix A.3).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# ---------------------------------------------------------------------------
# Initialisers (torch-default-compatible)
# ---------------------------------------------------------------------------


def _uniform(rng, shape, bound):
    return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)


def kaiming_uniform(rng, shape, fan_in):
    """torch's default Linear/Conv weight init: kaiming_uniform(a=sqrt(5))."""
    return _uniform(rng, shape, 1.0 / math.sqrt(fan_in))


def xavier_uniform(rng, shape, fan_in, fan_out):
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return _uniform(rng, shape, bound)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------


def linear_init(rng, d_in, d_out, xavier=False):
    kw, kb = jax.random.split(rng)
    if xavier:
        w = xavier_uniform(kw, (d_in, d_out), d_in, d_out)
    else:
        w = kaiming_uniform(kw, (d_in, d_out), d_in)
    b = _uniform(kb, (d_out,), 1.0 / math.sqrt(d_in))
    return {"w": w, "b": b}


def linear(p, x):
    return x @ p["w"] + p["b"]


# ---------------------------------------------------------------------------
# Conv2d (NHWC, HWIO)
# ---------------------------------------------------------------------------


def conv2d_init(rng, kh, kw_, c_in, c_out, xavier=False):
    kw1, kb = jax.random.split(rng)
    fan_in = kh * kw_ * c_in
    if xavier:
        w = xavier_uniform(kw1, (kh, kw_, c_in, c_out), fan_in, kh * kw_ * c_out)
    else:
        w = kaiming_uniform(kw1, (kh, kw_, c_in, c_out), fan_in)
    b = _uniform(kb, (c_out,), 1.0 / math.sqrt(fan_in))
    return {"w": w, "b": b}


def conv2d(p, x, pad_h, pad_w):
    """x: (N, H, W, C_in) -> (N, H', W', C_out) with explicit symmetric padding."""
    y = lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(1, 1),
        padding=[(pad_h, pad_h), (pad_w, pad_w)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.promote_types(x.dtype, jnp.float32),
    )
    return y + p["b"]


# ---------------------------------------------------------------------------
# BatchNorm (2d over channels; NHWC)
# ---------------------------------------------------------------------------


# torch BatchNorm2d default momentum — shared with the NISQA_DE serial
# running-stats composition (models/nisqa.py), which must use the SAME value
BN_MOMENTUM = 0.1


def batchnorm_init(c):
    return (
        {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)},
        {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)},
    )


def batchnorm(p, s, x, train=False, w=None, momentum=BN_MOMENTUM, eps=1e-5):
    """BatchNorm over all axes but the last (channel).

    ``w``: optional per-row validity weights broadcastable to x[..., 0]
    (1 = real segment, 0 = padding). In train mode batch statistics are
    computed over valid elements only, matching the reference's
    packed-sequence behaviour. Returns (y, new_state).
    """
    if train:
        axes = tuple(range(x.ndim - 1))
        if w is None:
            n = jnp.float32(np.prod(x.shape[:-1]))
            mean = jnp.mean(x, axis=axes)
            var = jnp.mean((x - mean) ** 2, axis=axes)
        else:
            # w covers the leading axes; remaining spatial axes are all-valid
            wb = w
            while wb.ndim < x.ndim - 1:
                wb = wb[..., None]
            wb = jnp.broadcast_to(wb, x.shape[:-1]).astype(jnp.float32)[..., None]
            per_row = np.prod(x.shape[w.ndim : -1], dtype=np.float64)
            n = jnp.sum(w.astype(jnp.float32)) * jnp.float32(per_row)
            mean = jnp.sum(x * wb, axis=axes) / n
            var = jnp.sum(wb * (x - mean) ** 2, axis=axes) / n
        y = (x - mean) * lax.rsqrt(var + eps) * p["scale"] + p["bias"]
        # torch tracks the *unbiased* variance in running stats
        unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
        new_s = {
            "mean": (1 - momentum) * s["mean"] + momentum * mean,
            "var": (1 - momentum) * s["var"] + momentum * unbiased,
        }
        return y, new_s
    y = (x - s["mean"]) * lax.rsqrt(s["var"] + eps) * p["scale"] + p["bias"]
    return y, s


# ---------------------------------------------------------------------------
# LayerNorm
# ---------------------------------------------------------------------------


def layernorm_init(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def layernorm(p, x, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps) * p["scale"] + p["bias"]


# ---------------------------------------------------------------------------
# Dropout
# ---------------------------------------------------------------------------


def dropout(rng, x, rate, train):
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def dropout2d(rng, x, rate, train):
    """Channel dropout (torch nn.Dropout2d): zero whole (sample, channel) maps.

    x: (N, H, W, C) -> mask shape (N, 1, 1, C).
    """
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, x.shape[-1]))
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# Pooling primitives
# ---------------------------------------------------------------------------


def _adaptive_bins(n_in: int, n_out: int):
    """torch F.adaptive_max_pool2d bin boundaries (verified SURVEY Appendix A.3)."""
    starts = [int(math.floor(i * n_in / n_out)) for i in range(n_out)]
    ends = [int(math.ceil((i + 1) * n_in / n_out)) for i in range(n_out)]
    return starts, ends


def _adaptive_pool_1d(x, axis, n_out):
    """Adaptive max pooling along one axis with torch bin semantics.

    Compiled-code-size matters on TPU (a naive per-bin slice+stack emits
    ~250KB of fused-loop code per bin): express the pooling as one
    reduce_window per distinct bin size plus a handful of strided slices
    selecting the bin starts (bins differ by at most one in size).
    """
    n_in = x.shape[axis]
    starts, ends = _adaptive_bins(n_in, n_out)
    sizes = [e - s for s, e in zip(starts, ends)]

    # uniform fast path: one reduce_window with stride == size
    if len(set(sizes)) == 1 and all(
        starts[i + 1] - starts[i] == sizes[0] for i in range(len(starts) - 1)
    ):
        dims = [1] * x.ndim
        strides = [1] * x.ndim
        dims[axis] = sizes[0]
        strides[axis] = sizes[0]
        return lax.reduce_window(x, -jnp.inf, lax.max, dims, strides, "VALID")

    # general path: sliding max per distinct size, then strided-slice runs
    pooled = {}
    for s in set(sizes):
        dims = [1] * x.ndim
        strides = [1] * x.ndim
        dims[axis] = s
        pooled[s] = lax.reduce_window(x, -jnp.inf, lax.max, dims, strides, "VALID")

    # group consecutive bins with equal size and uniform start stride
    pieces = []
    i = 0
    n_bins = len(starts)
    while i < n_bins:
        j = i + 1
        stride = None
        while j < n_bins and sizes[j] == sizes[i]:
            st = starts[j] - starts[j - 1]
            if stride is None:
                stride = st
            elif st != stride:
                break
            j += 1
        src = pooled[sizes[i]]
        lo = [0] * x.ndim
        hi = list(src.shape)
        stv = [1] * x.ndim
        if stride == 0:
            # n_out > n_in: torch repeats the same input bin — emit one
            # slice and tile it (counts are tiny pool dims, code-size safe)
            lo[axis] = starts[i]
            hi[axis] = starts[i] + 1
            piece = lax.slice(src, lo, hi, stv)
            reps = [1] * x.ndim
            reps[axis] = j - i
            pieces.append(jnp.tile(piece, reps))
        else:
            stv[axis] = 1 if stride is None else stride
            lo[axis] = starts[i]
            hi[axis] = starts[j - 1] + 1
            pieces.append(lax.slice(src, lo, hi, stv))
        i = j
    return pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=axis)


def adaptive_max_pool2d(x, out_hw):
    """x: (N, H, W, C) -> (N, oh, ow, C), torch F.adaptive_max_pool2d bins.

    Separable (max over a rectangle == max over rows then cols)."""
    x = _adaptive_pool_1d(x, 1, int(out_hw[0]))
    x = _adaptive_pool_1d(x, 2, int(out_hw[1]))
    return x


def max_pool2d(x, pad_w=0):
    """torch MaxPool2d(2, stride=2, padding=(0, pad_w)) on NHWC (pads with -inf)."""
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding=[(0, 0), (0, 0), (pad_w, pad_w), (0, 0)],
    )


# ---------------------------------------------------------------------------
# Multi-head attention (torch.nn.MultiheadAttention semantics)
# ---------------------------------------------------------------------------


def mha_init(rng, d_model, xavier=True):
    k1, k2 = jax.random.split(rng)
    # torch fuses QKV into in_proj (3D, D); we keep the fused layout so the
    # checkpoint converter is a straight transpose
    if xavier:
        w_in = xavier_uniform(k1, (d_model, 3 * d_model), d_model, 3 * d_model)
        w_out = xavier_uniform(k2, (d_model, d_model), d_model, d_model)
    else:
        w_in = kaiming_uniform(k1, (d_model, 3 * d_model), d_model)
        w_out = kaiming_uniform(k2, (d_model, d_model), d_model)
    return {
        "w_in": w_in,
        "b_in": jnp.zeros((3 * d_model,), jnp.float32),
        "w_out": w_out,
        "b_out": jnp.zeros((d_model,), jnp.float32),
    }


def mha(p, x, key_valid, nhead, attn_dropout=0.0, train=False, rng=None):
    """Self-attention, x: (B, T, D); key_valid: (B, T) bool (True = attendable).

    Matches torch MHA with key_padding_mask = ~key_valid: scores at invalid
    keys get -inf before softmax; attention-weight dropout in train mode.
    """
    B, T, D = x.shape
    dh = D // nhead
    qkv = x @ p["w_in"] + p["b_in"]  # (B, T, 3D)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):  # (B, T, D) -> (B, nh, T, dh)
        return t.reshape(B, T, nhead, dh).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=lax.Precision.HIGHEST) / math.sqrt(dh)
    scores = jnp.where(key_valid[:, None, None, :], scores, -jnp.inf)
    att = jax.nn.softmax(scores, axis=-1)
    att = dropout(rng, att, attn_dropout, train)
    out = jnp.einsum("bhqk,bhkd->bhqd", att, v, precision=lax.Precision.HIGHEST)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
    return out @ p["w_out"] + p["b_out"]


# ---------------------------------------------------------------------------
# LSTM (torch gate order i, f, g, o; packed-sequence-equivalent masking)
# ---------------------------------------------------------------------------


def lstm_layer_init(rng, d_in, h):
    ks = jax.random.split(rng, 4)
    bound = 1.0 / math.sqrt(h)
    return {
        "w_ih": _uniform(ks[0], (d_in, 4 * h), bound),
        "w_hh": _uniform(ks[1], (h, 4 * h), bound),
        "b_ih": _uniform(ks[2], (4 * h,), bound),
        "b_hh": _uniform(ks[3], (4 * h,), bound),
    }


def lstm_layer(p, x, n_wins, reverse=False):
    """One direction of an LSTM over (B, T, I) with per-sample lengths.

    Packed-sequence equivalence (`NISQA_lib.py:925-941`): steps t >= n_wins
    leave the carry unchanged and output zeros. The reverse direction scans
    from T-1 down, so its first *processed* step is t = n_wins - 1, exactly
    like torch's packed bidirectional LSTM.
    """
    B, T, _ = x.shape
    h_dim = p["w_hh"].shape[0]
    # precompute the input projection as one big MXU matmul; highest
    # precision — recurrent accumulation over T steps amplifies bf16-pass
    # rounding into >0.01 MOS drift on long TTS clips, and this matmul is
    # a negligible fraction of total FLOPs
    xproj = jnp.dot(x, p["w_ih"], precision=lax.Precision.HIGHEST) + (
        p["b_ih"] + p["b_hh"]
    )  # (B, T, 4H)
    xs = jnp.moveaxis(xproj, 1, 0)  # (T, B, 4H)
    t_idx = jnp.arange(T, dtype=jnp.int32)
    if reverse:
        xs = xs[::-1]
        t_idx = t_idx[::-1]
    valid = (t_idx[:, None] < n_wins[None, :]).astype(x.dtype)  # (T, B)

    def step(carry, inp):
        h, c = carry
        gates_x, v = inp
        # recurrent matmul at highest precision: error compounds over T
        # steps and this (H x 4H) product is bandwidth-bound anyway
        gates = gates_x + jnp.dot(h, p["w_hh"], precision=lax.Precision.HIGHEST)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        vb = v[:, None]
        h = vb * h_new + (1 - vb) * h
        c = vb * c_new + (1 - vb) * c
        return (h, c), h_new * vb  # outputs at pad steps are zero

    # carry dtype follows the input (f64 under the x64 parity tests)
    init = (jnp.zeros((B, h_dim), x.dtype), jnp.zeros((B, h_dim), x.dtype))
    _, ys = lax.scan(step, init, (xs, valid))
    if reverse:
        ys = ys[::-1]
    return jnp.moveaxis(ys, 0, 1)  # (B, T, H)


def lstm_init(rng, d_in, h, num_layers, bidirectional):
    dirs = 2 if bidirectional else 1
    layers = []
    for l in range(num_layers):
        in_l = d_in if l == 0 else h * dirs
        sub = {}
        rng, k = jax.random.split(rng)
        sub["fwd"] = lstm_layer_init(k, in_l, h)
        if bidirectional:
            rng, k = jax.random.split(rng)
            sub["bwd"] = lstm_layer_init(k, in_l, h)
        layers.append(sub)
    return {"layers": layers}


def lstm(p, x, n_wins, bidirectional, dropout_rate=0.0, train=False, rng=None):
    """Stacked (bi)LSTM; output (B, T, H*dirs) with [fwd, bwd] concat like torch."""
    y = x
    n_layers = len(p["layers"])
    for li, layer in enumerate(p["layers"]):
        outs = [lstm_layer(layer["fwd"], y, n_wins, reverse=False)]
        if bidirectional:
            outs.append(lstm_layer(layer["bwd"], y, n_wins, reverse=True))
        y = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
        if train and dropout_rate > 0.0 and li < n_layers - 1 and rng is not None:
            rng, k = jax.random.split(rng)
            y = dropout(k, y, dropout_rate, train)
    return y


# ---------------------------------------------------------------------------
# Masks
# ---------------------------------------------------------------------------


def length_mask(n_wins, T):
    """(B,) lengths -> (B, T) bool validity mask."""
    return jnp.arange(T, dtype=jnp.int32)[None, :] < n_wins[:, None].astype(jnp.int32)
