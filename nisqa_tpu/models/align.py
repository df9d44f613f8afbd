"""Double-ended alignment + fusion.

Capability parity with `/root/reference/nisqa/NISQA_lib.py:1228-1417`:
five similarity scorers (bahd/luong/dot/cosine/distance), soft/hard
application, and the three fusion modes. The O(T^2) score matrix is one
batched MXU matmul (dot/luong) or a broadcast reduction; hard attention is a
take_along_axis gather (non-differentiable argmax, matching the reference's
straight-through-by-gather training behaviour).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import modules as M


def alignment_init(rng, att_method, q_dim, y_dim, att_dim=128):
    if att_method in ("dot", "cosine", "distance") or att_method in ("none", None):
        return {"method": att_method, "params": {}}
    if att_method == "bahd":
        k1, k2, k3 = jax.random.split(rng, 3)
        return {
            "method": "bahd",
            "params": {
                "wq": M.linear_init(k1, q_dim, att_dim),
                "wy": M.linear_init(k2, y_dim, att_dim),
                "v": M.linear_init(k3, att_dim, 1),
            },
        }
    if att_method == "luong":
        return {"method": "luong", "params": {"w": M.linear_init(rng, y_dim, q_dim)}}
    raise NotImplementedError(f"alignment method not available: {att_method}")


def _scores(method, params, q, y):
    """q: (B, Tq, D), y: (B, Ty, D) -> att (B, Tq, Ty)."""
    if method == "dot":
        return jnp.einsum("bqd,byd->bqy", q, y)
    if method == "luong":
        return jnp.einsum("bqd,byd->bqy", q, M.linear(params["w"], y))
    if method == "cosine":
        # per-norm clamping at eps, NOT the docstring's max(||q||*||y||, eps):
        # torch's ATen kernel (>=1.9, incl. the reference's 1.10) clamps each
        # norm separately — pinned empirically vs torch in
        # tests/test_round2_fixes.py::test_cosine_scores_match_torch_on_small_norms
        eps = 1e-8
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)
        yn = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), eps)
        return jnp.einsum("bqd,byd->bqy", qn, yn)
    if method == "distance":
        # att[q, y] = -mean_d |q - y|  (dist_norm = weight_norm = 1)
        d = jnp.abs(q[:, :, None, :] - y[:, None, :, :]).mean(axis=-1)
        return -d
    if method == "bahd":
        a = jnp.tanh(M.linear(params["wq"], q)[:, :, None, :] + M.linear(params["wy"], y)[:, None, :, :])
        return M.linear(params["v"], a)[..., 0]
    raise NotImplementedError(method)


def alignment_apply(align_def, q, y, n_wins_y, apply_method="hard"):
    """Align reference features y to degraded query q (`NISQA_lib.py:1279-1285`)."""
    method = align_def["method"]
    if method in ("none", None):
        return y
    att = _scores(method, align_def["params"], q, y)  # (B, Tq, Ty)
    Ty = y.shape[1]
    key_valid = M.length_mask(n_wins_y, Ty)  # (B, Ty)
    att = jnp.where(key_valid[:, None, :], att, -jnp.inf)
    if apply_method == "hard":
        idx = jnp.argmax(att, axis=2)  # (B, Tq)
        return jnp.take_along_axis(y, idx[:, :, None], axis=1)
    if apply_method == "soft":
        att = jax.nn.softmax(att, axis=2)
        return jnp.einsum("bqy,byd->bqd", att, y)
    raise NotImplementedError(f"alignment apply method not available: {apply_method}")


# ---------------------------------------------------------------------------
# Fusion (`NISQA_lib.py:1380-1417`)
# ---------------------------------------------------------------------------


def fusion_fan_out(fuse, in_feat, fuse_dim=None):
    if fuse == "x/y/-":
        out = 3 * in_feat
    elif fuse in ("+/-", "x/y"):
        out = 2 * in_feat
    else:
        raise NotImplementedError(f"fuse mode not available: {fuse}")
    return int(fuse_dim) if fuse_dim else out


def fusion_init(rng, fuse, in_feat, fuse_dim=None):
    params = {}
    if fuse_dim:
        concat = 3 * in_feat if fuse == "x/y/-" else 2 * in_feat
        params["lin"] = M.linear_init(rng, concat, int(fuse_dim))
    return {"fuse": fuse, "params": params}


def fusion_apply(fuse_def, x, y):
    fuse = fuse_def["fuse"]
    if fuse == "x/y/-":
        out = jnp.concatenate([x, y, x - y], axis=2)
    elif fuse == "+/-":
        out = jnp.concatenate([x + y, x - y], axis=2)
    elif fuse == "x/y":
        out = jnp.concatenate([x, y], axis=2)
    else:
        raise NotImplementedError(fuse)
    if "lin" in fuse_def["params"]:
        out = M.linear(fuse_def["params"]["lin"], out)
    return out
