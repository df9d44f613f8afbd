"""Framewise (per-segment) models: AdaptCNN, StandardCNN, DFF, Skip.

Capability parity with the reference framewise stage
(`/root/reference/nisqa/NISQA_lib.py:428-836`). TPU design: instead of
packing only valid segments (`pack_padded_sequence`, `NISQA_lib.py:489-494`),
all B*T segments run densely in one large NHWC conv batch — output-equivalent
in eval mode, and train-mode BatchNorm statistics are masked to valid
segments (SURVEY.md Appendix A.4-5).

Flattened CNN outputs use torch's channel-major order so downstream weights
load unchanged from released checkpoints.
"""

from __future__ import annotations

import jax

from . import modules as M


def _kernel_hw(kernel_size):
    if isinstance(kernel_size, int):
        return kernel_size, kernel_size
    return int(kernel_size[0]), int(kernel_size[1])


# ---------------------------------------------------------------------------
# AdaptCNN (`NISQA_lib.py:586-710`) — the hot CNN of the v2.0 models
# ---------------------------------------------------------------------------


def adapt_cnn_init(rng, cfg):
    kh, kw = _kernel_hw(cfg["cnn_kernel_size"])
    c1, c2, c3 = cfg["cnn_c_out_1"], cfg["cnn_c_out_2"], cfg["cnn_c_out_3"]
    kw_last = int(cfg["cnn_pool_3"][1])
    # 7 keys: 6 convs + fc. Re-splitting the already-consumed rng would
    # alias the fc key with ks[1] (split(k, 2) is a prefix of split(k, 6))
    ks = jax.random.split(rng, 7)
    params, state = {}, {}
    chans = [(1, c1, (kh, kw)), (c1, c2, (kh, kw)), (c2, c3, (kh, kw)),
             (c3, c3, (kh, kw)), (c3, c3, (kh, kw)), (c3, c3, (kh, kw_last))]
    for i, (ci, co, k) in enumerate(chans, start=1):
        params[f"conv{i}"] = M.conv2d_init(ks[i - 1], k[0], k[1], ci, co)
        params[f"bn{i}"], state[f"bn{i}"] = M.batchnorm_init(co)
    fan_out = c3 * int(cfg["cnn_pool_3"][0])
    if cfg.get("cnn_fc_out_h"):
        params["fc"] = M.linear_init(ks[6], fan_out, int(cfg["cnn_fc_out_h"]))
        fan_out = int(cfg["cnn_fc_out_h"])
    return params, state, fan_out


def adapt_cnn_apply(params, state, cfg, x, valid=None, train=False, rng=None):
    """x: (N, H, W, 1) NHWC -> (N, fan_out). valid: (N,) mask for BN stats."""
    kh, kw = _kernel_hw(cfg["cnn_kernel_size"])
    pad_w = 0 if kw == 1 else 1
    p1, p2, p3 = cfg["cnn_pool_1"], cfg["cnn_pool_2"], cfg["cnn_pool_3"]
    drop = cfg.get("cnn_dropout", 0.2)
    new_state = {}
    rngs = jax.random.split(rng, 4) if rng is not None else [None] * 4

    def block(i, x, pad_w_i=pad_w):
        y = M.conv2d(params[f"conv{i}"], x, 1, pad_w_i)
        y, new_state[f"bn{i}"] = M.batchnorm(params[f"bn{i}"], state[f"bn{i}"], y, train, valid)
        return jax.nn.relu(y)

    x = block(1, x)
    x = M.adaptive_max_pool2d(x, p1)
    x = block(2, x)
    x = M.adaptive_max_pool2d(x, p2)
    x = M.dropout2d(rngs[0], x, drop, train)
    x = block(3, x)
    x = M.dropout2d(rngs[1], x, drop, train)
    x = block(4, x)
    x = M.adaptive_max_pool2d(x, p3)
    x = M.dropout2d(rngs[2], x, drop, train)
    x = block(5, x)
    x = M.dropout2d(rngs[3], x, drop, train)
    x = block(6, x, pad_w_i=0)  # kernel (kh, pool_3[1]) collapses width to 1
    # torch flattens NCHW channel-major: (N, C, H, 1) -> (N, C*H)
    n = x.shape[0]
    x = x[:, :, 0, :].transpose(0, 2, 1).reshape(n, -1)
    if "fc" in params:
        x = M.linear(params["fc"], x)
    return x, new_state


# ---------------------------------------------------------------------------
# StandardCNN (`NISQA_lib.py:712-836`) — used by the released TTS model
# ---------------------------------------------------------------------------


def standard_cnn_init(rng, cfg):
    kh, kw = _kernel_hw(cfg["cnn_kernel_size"])
    c1, c2, c3 = cfg["cnn_c_out_1"], cfg["cnn_c_out_2"], cfg["cnn_c_out_3"]
    ks = jax.random.split(rng, 7)  # 6 convs + fc (see adapt_cnn_init note)
    params, state = {}, {}
    chans = [(1, c1), (c1, c2), (c2, c3), (c3, c3), (c3, c3), (c3, c3)]
    for i, (ci, co) in enumerate(chans, start=1):
        params[f"conv{i}"] = M.conv2d_init(ks[i - 1], kh, kw, ci, co)
        params[f"bn{i}"], state[f"bn{i}"] = M.batchnorm_init(co)
    fan_out = c3 * 6 * 2  # 48x15 pooled 3x -> 6x2
    if cfg.get("cnn_fc_out_h"):
        params["fc"] = M.linear_init(ks[6], fan_out, int(cfg["cnn_fc_out_h"]))
        fan_out = int(cfg["cnn_fc_out_h"])
    return params, state, fan_out


def standard_cnn_apply(params, state, cfg, x, valid=None, train=False, rng=None):
    drop = cfg.get("cnn_dropout", 0.2)
    new_state = {}
    rngs = jax.random.split(rng, 4) if rng is not None else [None] * 4

    def block(i, x):
        y = M.conv2d(params[f"conv{i}"], x, 1, 1)
        y, new_state[f"bn{i}"] = M.batchnorm(params[f"bn{i}"], state[f"bn{i}"], y, train, valid)
        return jax.nn.relu(y)

    x = block(1, x)
    x = M.max_pool2d(x, pad_w=1)  # 48x15 -> 24x8
    x = block(2, x)
    x = M.max_pool2d(x)  # -> 12x4
    x = M.dropout2d(rngs[0], x, drop, train)
    x = block(3, x)
    x = M.dropout2d(rngs[1], x, drop, train)
    x = block(4, x)
    x = M.max_pool2d(x)  # -> 6x2
    x = M.dropout2d(rngs[2], x, drop, train)
    x = block(5, x)
    x = M.dropout2d(rngs[3], x, drop, train)
    x = block(6, x)
    n = x.shape[0]
    # torch flatten (N, C, 6, 2) channel-major
    x = x.transpose(0, 3, 1, 2).reshape(n, -1)
    if "fc" in params:
        x = M.linear(params["fc"], x)
    return x, new_state


# ---------------------------------------------------------------------------
# DFF (`NISQA_lib.py:536-583`) — feed-forward baseline
# ---------------------------------------------------------------------------


def dff_init(rng, cfg):
    if not cfg.get("cnn_fc_out_h"):
        # fail fast like the reference: its factory passes cnn_fc_out_h
        # straight into nn.Linear (`NISQA_model.py:972`), which errors on
        # None — a silent 4096 here would build a model no reference
        # checkpoint can correspond to
        raise ValueError("cnn_model='dff' requires cnn_fc_out_h to be set")
    h = int(cfg["cnn_fc_out_h"])
    fan_in = int(cfg["ms_seg_length"]) * int(cfg["ms_n_mels"])
    ks = jax.random.split(rng, 4)
    params = {f"lin{i+1}": M.linear_init(ks[i], fan_in if i == 0 else h, h) for i in range(4)}
    state = {}
    params["bn1"], state["bn1"] = M.batchnorm_init(1)
    for i in range(2, 6):
        params[f"bn{i}"], state[f"bn{i}"] = M.batchnorm_init(h)
    return params, state, h


def dff_apply(params, state, cfg, x, valid=None, train=False, rng=None):
    drop = cfg.get("cnn_dropout", 0.2)
    new_state = {}
    rngs = jax.random.split(rng, 3) if rng is not None else [None] * 3
    x, new_state["bn1"] = M.batchnorm(params["bn1"], state["bn1"], x, train, valid)
    n = x.shape[0]
    x = x[:, :, :, 0].reshape(n, -1)  # (N, H*W), matches torch C=1 flatten
    for i in range(1, 5):
        x = M.linear(params[f"lin{i}"], x)
        x, new_state[f"bn{i+1}"] = M.batchnorm(params[f"bn{i+1}"], state[f"bn{i+1}"], x, train, valid)
        x = jax.nn.relu(x)
        if i < 4:
            x = M.dropout(rngs[i - 1], x, drop, train)
    return x, new_state


# ---------------------------------------------------------------------------
# Skip (`NISQA_lib.py:504-534`) — BatchNorm + flatten (+ optional Linear)
# ---------------------------------------------------------------------------


def skip_init(rng, cfg):
    fan_in = int(cfg["ms_seg_length"]) * int(cfg["ms_n_mels"])
    params, state = {}, {}
    params["bn"], state["bn"] = M.batchnorm_init(1)
    fan_out = fan_in
    if cfg.get("cnn_fc_out_h"):
        params["fc"] = M.linear_init(rng, fan_in, int(cfg["cnn_fc_out_h"]))
        fan_out = int(cfg["cnn_fc_out_h"])
    return params, state, fan_out


def skip_apply(params, state, cfg, x, valid=None, train=False, rng=None):
    new_state = {}
    x, new_state["bn"] = M.batchnorm(params["bn"], state["bn"], x, train, valid)
    n = x.shape[0]
    x = x[:, :, :, 0].reshape(n, -1)
    if "fc" in params:
        x = M.linear(params["fc"], x)
    return x, new_state


FRAMEWISE = {
    "adapt": (adapt_cnn_init, adapt_cnn_apply),
    "standard": (standard_cnn_init, standard_cnn_apply),
    "dff": (dff_init, dff_apply),
    "skip": (skip_init, skip_apply),
    None: (skip_init, skip_apply),
}


def framewise_init(rng, cfg):
    model = cfg.get("cnn_model") or "skip"
    if model == "standard":
        if int(cfg["ms_n_mels"]) != 48 or int(cfg["ms_seg_length"]) != 15:
            raise ValueError("StandardCNN requires 48 mels x seg_length 15")
        kh, kw = _kernel_hw(cfg["cnn_kernel_size"])
        if (kh, kw) != (3, 3):
            raise ValueError("StandardCNN requires kernel_size 3")
    if model not in FRAMEWISE:
        raise NotImplementedError(f"Framewise model not available: {model}")
    return FRAMEWISE[model][0](rng, cfg)


def framewise_apply(params, state, cfg, segs, n_wins, train=False, rng=None,
                    row_valid=None):
    """segs: (B, T, H, S) -> features (B, T, fan_out).

    Runs the framewise model densely over all B*T segments (one big MXU
    batch); BN statistics in train mode are weighted by the validity mask.
    ``row_valid``: optional (B,) bool excluding whole rows from BN batch
    statistics — used for mesh-padding rows of ragged data-parallel batches,
    whose data duplicates row 0 but must not enter the statistics (the
    reference's packed sequences exclude padding entirely,
    `NISQA_lib.py:489-494`).
    """
    model = cfg.get("cnn_model") or "skip"
    apply_fn = FRAMEWISE[model][1]
    B, T, H, S = segs.shape
    x = segs.reshape(B * T, H, S, 1)
    valid = None
    if train:
        valid = M.length_mask(n_wins, T)
        if row_valid is not None:
            valid = valid & row_valid[:, None]
        valid = valid.reshape(B * T)
    y, new_state = apply_fn(params, state, cfg, x, valid, train, rng)
    return y.reshape(B, T, -1), new_state
