"""Time-dependency models: Transformer self-attention, LSTM, skip.

Capability parity with `/root/reference/nisqa/NISQA_lib.py:839-1062`.
TPU design: static (B, T, D) layout with a key-validity mask instead of the
reference's seq-first transposes and packed sequences. Post-norm transformer
encoder layers exactly as the reference (residual -> LayerNorm), with the
reference's Xavier-uniform re-init of all matrix-shaped parameters
(`NISQA_lib.py:983-986`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from . import modules as M


# ---------------------------------------------------------------------------
# Sinusoidal positional encoding (`NISQA_lib.py:1042-1062`; off in all
# released configs, kept for config parity)
# ---------------------------------------------------------------------------


def positional_encoding_table(d_model: int, max_len: int = 3000) -> np.ndarray:
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe.astype(np.float32)


# ---------------------------------------------------------------------------
# Self-attention TD (`NISQA_lib.py:945-1040`)
# ---------------------------------------------------------------------------


def self_attention_init(rng, input_size, d_model, nhead, num_layers, sa_h, pos_enc=False):
    ks = jax.random.split(rng, num_layers + 2)
    params = {
        # input projection + pre-stack LayerNorm; all >1-dim params are
        # xavier-uniform like the reference's _reset_parameters
        "linear": M.linear_init(ks[0], input_size, d_model, xavier=True),
        "norm1": M.layernorm_init(d_model),
        "layers": [],
    }
    for li in range(num_layers):
        k = ks[li + 1]
        k1, k2, k3 = jax.random.split(k, 3)
        params["layers"].append(
            {
                "attn": M.mha_init(k1, d_model, xavier=True),
                "linear1": M.linear_init(k2, d_model, sa_h, xavier=True),
                "linear2": M.linear_init(k3, sa_h, d_model, xavier=True),
                "norm1": M.layernorm_init(d_model),
                "norm2": M.layernorm_init(d_model),
            }
        )
    if pos_enc:
        params["pe"] = jnp.asarray(positional_encoding_table(d_model))
    return params


def self_attention_apply(params, cfg_sa, x, n_wins, train=False, rng=None):
    """x: (B, T, input_size) -> (B, T, d_model)."""
    nhead = int(cfg_sa["nhead"])
    drop = float(cfg_sa.get("dropout") or 0.0)
    activation = cfg_sa.get("activation", "relu")
    act = jax.nn.relu if activation == "relu" else jax.nn.gelu

    B, T, _ = x.shape
    key_valid = M.length_mask(n_wins, T)
    h = M.linear(params["linear"], x)
    h = M.layernorm(params["norm1"], h)
    if "pe" in params:
        h = h + params["pe"][:T][None, :, :]
        if train and rng is not None:
            rng, k = jax.random.split(rng)
            h = M.dropout(k, h, drop, train)

    for layer in params["layers"]:
        if rng is not None:
            rng, k_att, k1, k2, k3 = jax.random.split(rng, 5)
        else:
            k_att = k1 = k2 = k3 = None
        a = M.mha(layer["attn"], h, key_valid, nhead, attn_dropout=drop, train=train, rng=k_att)
        h = M.layernorm(layer["norm1"], h + M.dropout(k1, a, drop, train))
        f = M.linear(layer["linear1"], h)
        f = M.dropout(k2, act(f), drop, train)
        f = M.linear(layer["linear2"], f)
        h = M.layernorm(layer["norm2"], h + M.dropout(k3, f, drop, train))
    return h


# ---------------------------------------------------------------------------
# TimeDependency dispatcher (`NISQA_lib.py:839-895`)
# ---------------------------------------------------------------------------


def td_init(rng, input_size, cfg, prefix="td"):
    """cfg keys: {prefix}, {prefix}_sa_*, {prefix}_lstm_* (reference arg names)."""
    kind = cfg.get(prefix) or "skip"
    if kind == "self_att":
        d_model = int(cfg[f"{prefix}_sa_d_model"])
        params = self_attention_init(
            rng,
            input_size,
            d_model,
            int(cfg[f"{prefix}_sa_nhead"]),
            int(cfg[f"{prefix}_sa_num_layers"]),
            int(cfg[f"{prefix}_sa_h"]),
            bool(cfg.get(f"{prefix}_sa_pos_enc")),
        )
        return {"kind": "self_att", "params": params, "fan_out": d_model}
    if kind == "lstm":
        h = int(cfg[f"{prefix}_lstm_h"])
        n_layers = int(cfg[f"{prefix}_lstm_num_layers"])
        bi = bool(cfg[f"{prefix}_lstm_bidirectional"])
        params = M.lstm_init(rng, input_size, h, n_layers, bi)
        return {"kind": "lstm", "params": params, "fan_out": (2 if bi else 1) * h}
    if kind == "skip":
        return {"kind": "skip", "params": {}, "fan_out": input_size}
    raise NotImplementedError(f"Time dependency option not available: {kind}")


def td_apply(td_def, params, cfg, x, n_wins, prefix="td", train=False, rng=None):
    kind = td_def["kind"]
    if kind == "self_att":
        cfg_sa = {
            "nhead": cfg[f"{prefix}_sa_nhead"],
            "dropout": cfg.get(f"{prefix}_sa_dropout"),
            "activation": "relu",
        }
        return self_attention_apply(params, cfg_sa, x, n_wins, train, rng)
    if kind == "lstm":
        return M.lstm(
            params,
            x,
            n_wins,
            bool(cfg[f"{prefix}_lstm_bidirectional"]),
            float(cfg.get(f"{prefix}_lstm_dropout") or 0.0),
            train,
            rng,
        )
    return x
