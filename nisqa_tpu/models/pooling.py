"""Pooling heads: attention (PoolAtt/PoolAttFF), avg, max, last-step (bi).

Capability parity with `/root/reference/nisqa/NISQA_lib.py:1065-1225`.
All variants are masked static-shape reductions over (B, T, D); the
reference's in-place ``masked_fill_`` hazards (`NISQA_lib.py:1198,1219`)
disappear by construction in the functional rewrite.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import modules as M


def pooling_init(rng, d_input, output_size, pool, att_h=None):
    if pool == "att":
        if att_h is None:
            k1, k2 = jax.random.split(rng)
            return {
                "kind": "att",
                "params": {"linear1": M.linear_init(k1, d_input, 1),
                           "linear2": M.linear_init(k2, d_input, output_size)},
            }
        k1, k2, k3 = jax.random.split(rng, 3)
        return {
            "kind": "att_ff",
            "params": {
                "linear1": M.linear_init(k1, d_input, int(att_h)),
                "linear2": M.linear_init(k2, int(att_h), 1),
                "linear3": M.linear_init(k3, d_input, output_size),
            },
        }
    if pool in ("avg", "max", "last_step", "last_step_bi"):
        return {"kind": pool, "params": {"linear": M.linear_init(rng, d_input, output_size)}}
    raise NotImplementedError(f"Pool option not available: {pool}")


def pooling_apply(pool_def, params, x, n_wins, att_dropout=0.0, train=False, rng=None):
    """x: (B, T, D), n_wins: (B,) -> (B, output_size)."""
    kind = pool_def["kind"]
    B, T, D = x.shape
    mask = M.length_mask(n_wins, T)  # (B, T)

    if kind in ("att", "att_ff"):
        if kind == "att":
            score = M.linear(params["linear1"], x)[..., 0]  # (B, T)
            out_lin = params["linear2"]
        else:
            h = jax.nn.relu(M.linear(params["linear1"], x))
            h = M.dropout(rng, h, att_dropout, train)
            score = M.linear(params["linear2"], h)[..., 0]
            out_lin = params["linear3"]
        score = jnp.where(mask, score, -jnp.inf)
        att = jax.nn.softmax(score, axis=1)
        pooled = jnp.einsum("bt,btd->bd", att, x)
        return M.linear(out_lin, pooled)

    if kind == "avg":
        xm = jnp.where(mask[:, :, None], x, 0.0)
        pooled = xm.sum(axis=1) / n_wins[:, None].astype(x.dtype)
        return M.linear(params["linear"], pooled)

    if kind == "max":
        xm = jnp.where(mask[:, :, None], x, -jnp.inf)
        pooled = xm.max(axis=1)
        return M.linear(params["linear"], pooled)

    if kind == "last_step":
        idx = (n_wins - 1).astype(jnp.int32)
        pooled = x[jnp.arange(B), idx]
        return M.linear(params["linear"], pooled)

    if kind == "last_step_bi":
        # x is a biLSTM output (B, T, 2H) laid out [forward, backward];
        # take forward state at t=n_wins-1 and backward state at t=0
        # (`NISQA_lib.py:1099-1115`)
        h = D // 2
        idx = (n_wins - 1).astype(jnp.int32)
        fwd_last = x[jnp.arange(B), idx, :h]
        bwd_first = x[:, 0, h:]
        pooled = jnp.concatenate([fwd_last, bwd_first], axis=1)
        return M.linear(params["linear"], pooled)

    raise NotImplementedError(kind)
