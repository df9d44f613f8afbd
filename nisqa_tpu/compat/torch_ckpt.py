"""PyTorch checkpoint interop.

Reads the reference's ``.tar`` pickle checkpoints
(`/root/reference/nisqa/NISQA_model.py:928-1030` save format described in
SURVEY.md §5) and converts the state dict into this framework's parameter
pytree — and back, so models trained here can be exported for the reference.

torch (CPU) is used *only* here, as a pickle reader/writer; nothing in the
compute path depends on it.

Layout conversions (verified recipes, SURVEY.md Appendix A.7):
  * Conv2d weight OIHW -> HWIO transpose.
  * Linear weight (out, in) -> (in, out) transpose.
  * MultiheadAttention fused ``in_proj_weight`` (3D, D) -> (D, 3D) transpose,
    kept fused (split happens inside the kernel).
  * LSTM ``weight_ih_l{k}[_reverse]`` (4H, in) -> (in, 4H); gate order
    (i, f, g, o) is preserved as-is.
"""

from __future__ import annotations

import numpy as np


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .tar checkpoint -> {'args': dict, 'state_dict': {name: np.ndarray}, ...}."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.detach().cpu().numpy() for k, v in ckpt["model_state_dict"].items()}
    out = {"args": dict(ckpt["args"]), "state_dict": sd}
    for k in ("runname", "epoch", "model_name", "results", "db_results", "optimizer_state_dict"):
        if k in ckpt:
            out[k] = ckpt[k]
    return out


# ---------------------------------------------------------------------------
# torch state_dict  ->  nisqa_tpu pytree
# ---------------------------------------------------------------------------


def _lin(sd, prefix):
    return {"w": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
            "b": sd[f"{prefix}.bias"].copy()}


def _conv(sd, prefix):
    return {"w": np.ascontiguousarray(sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)),
            "b": sd[f"{prefix}.bias"].copy()}


def _bn(sd, prefix):
    p = {"scale": sd[f"{prefix}.weight"].copy(), "bias": sd[f"{prefix}.bias"].copy()}
    s = {"mean": sd[f"{prefix}.running_mean"].copy(), "var": sd[f"{prefix}.running_var"].copy()}
    return p, s


def _norm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"].copy(), "bias": sd[f"{prefix}.bias"].copy()}


def _mha(sd, prefix):
    return {
        "w_in": np.ascontiguousarray(sd[f"{prefix}.in_proj_weight"].T),
        "b_in": sd[f"{prefix}.in_proj_bias"].copy(),
        "w_out": np.ascontiguousarray(sd[f"{prefix}.out_proj.weight"].T),
        "b_out": sd[f"{prefix}.out_proj.bias"].copy(),
    }


def _cnn_from_torch(sd, cfg, prefix="cnn.model"):
    model = cfg.get("cnn_model") or "skip"
    params, state = {}, {}
    if model in ("adapt", "standard"):
        for i in range(1, 7):
            params[f"conv{i}"] = _conv(sd, f"{prefix}.conv{i}")
            params[f"bn{i}"], state[f"bn{i}"] = _bn(sd, f"{prefix}.bn{i}")
        if cfg.get("cnn_fc_out_h"):
            fc_name = "fc" if model == "adapt" else "fc_out"
            params["fc"] = _lin(sd, f"{prefix}.{fc_name}")
    elif model == "dff":
        for i in range(1, 5):
            params[f"lin{i}"] = _lin(sd, f"{prefix}.lin{i}")
        for i in range(1, 6):
            params[f"bn{i}"], state[f"bn{i}"] = _bn(sd, f"{prefix}.bn{i}")
    else:  # skip
        params["bn"], state["bn"] = _bn(sd, f"{prefix}.bn")
        if cfg.get("cnn_fc_out_h"):
            params["fc"] = _lin(sd, f"{prefix}.linear")
    return params, state


def _sa_from_torch(sd, prefix, num_layers, pos_enc=False):
    params = {
        "linear": _lin(sd, f"{prefix}.linear"),
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "layers": [],
    }
    for i in range(num_layers):
        lp = f"{prefix}.layers.{i}"
        params["layers"].append(
            {
                "attn": _mha(sd, f"{lp}.self_attn"),
                "linear1": _lin(sd, f"{lp}.linear1"),
                "linear2": _lin(sd, f"{lp}.linear2"),
                "norm1": _norm(sd, f"{lp}.norm1"),
                "norm2": _norm(sd, f"{lp}.norm2"),
            }
        )
    if pos_enc:
        from ..models.td import positional_encoding_table

        d_model = params["norm1"]["scale"].shape[0]
        params["pe"] = positional_encoding_table(d_model)
    return params


def _lstm_from_torch(sd, prefix, num_layers, bidirectional):
    layers = []
    for l in range(num_layers):
        sub = {
            "fwd": {
                "w_ih": np.ascontiguousarray(sd[f"{prefix}.weight_ih_l{l}"].T),
                "w_hh": np.ascontiguousarray(sd[f"{prefix}.weight_hh_l{l}"].T),
                "b_ih": sd[f"{prefix}.bias_ih_l{l}"].copy(),
                "b_hh": sd[f"{prefix}.bias_hh_l{l}"].copy(),
            }
        }
        if bidirectional:
            sub["bwd"] = {
                "w_ih": np.ascontiguousarray(sd[f"{prefix}.weight_ih_l{l}_reverse"].T),
                "w_hh": np.ascontiguousarray(sd[f"{prefix}.weight_hh_l{l}_reverse"].T),
                "b_ih": sd[f"{prefix}.bias_ih_l{l}_reverse"].copy(),
                "b_hh": sd[f"{prefix}.bias_hh_l{l}_reverse"].copy(),
            }
        layers.append(sub)
    return {"layers": layers}


def _td_from_torch(sd, cfg, prefix_torch, prefix_cfg):
    kind = cfg.get(prefix_cfg) or "skip"
    if kind == "self_att":
        return _sa_from_torch(
            sd, f"{prefix_torch}.model", int(cfg[f"{prefix_cfg}_sa_num_layers"]),
            bool(cfg.get(f"{prefix_cfg}_sa_pos_enc")),
        )
    if kind == "lstm":
        return _lstm_from_torch(
            sd, f"{prefix_torch}.model.lstm", int(cfg[f"{prefix_cfg}_lstm_num_layers"]),
            bool(cfg[f"{prefix_cfg}_lstm_bidirectional"]),
        )
    return {}


def _pool_from_torch(sd, prefix, pool, att_h):
    if pool == "att":
        if att_h is None:
            return {"linear1": _lin(sd, f"{prefix}.linear1"), "linear2": _lin(sd, f"{prefix}.linear2")}
        return {
            "linear1": _lin(sd, f"{prefix}.linear1"),
            "linear2": _lin(sd, f"{prefix}.linear2"),
            "linear3": _lin(sd, f"{prefix}.linear3"),
        }
    return {"linear": _lin(sd, f"{prefix}.linear")}


def params_from_torch(sd: dict, model) -> tuple:
    """Convert a reference state_dict to (params, state) for ``model``.

    ``model`` is a :class:`nisqa_tpu.models.nisqa.NisqaNet`.
    """
    cfg = model.cfg
    params, state = {}, {}
    params["cnn"], state["cnn"] = _cnn_from_torch(sd, cfg)
    params["td"] = _td_from_torch(sd, cfg, "time_dependency", "td")
    params["td2"] = _td_from_torch(sd, cfg, "time_dependency_2", "td_2")

    pool, att_h = cfg.get("pool", "att"), cfg.get("pool_att_h")
    if model.dim:
        params["pools"] = [
            _pool_from_torch(sd, f"pool_layers.{i}.model", pool, att_h) for i in range(5)
        ]
    else:
        params["pool"] = _pool_from_torch(sd, "pool.model", pool, att_h)

    if model.double_ended:
        method = cfg.get("de_align")
        if method == "bahd":
            params["align"] = {
                "wq": _lin(sd, "align.att.Wq"),
                "wy": _lin(sd, "align.att.Wy"),
                "v": _lin(sd, "align.att.v"),
            }
        elif method == "luong":
            params["align"] = {"w": _lin(sd, "align.att.W")}
        else:
            params["align"] = {}
        params["fuse"] = {}
        if cfg.get("de_fuse_dim"):
            params["fuse"]["lin"] = _lin(sd, "fuse.lin_fusion")

    import jax.numpy as jnp
    import jax

    to_jnp = lambda t: jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), t)
    return to_jnp(params), to_jnp(state)


def load_model_from_tar(path: str):
    """One call: .tar -> (NisqaNet, params, state, ckpt_args)."""
    from ..models.nisqa import build_model
    from .model_args import model_args_from_ckpt_args

    ckpt = load_torch_checkpoint(path)
    args = ckpt["args"]
    name = args["model"]
    margs = model_args_from_ckpt_args(args)
    model = build_model(name, margs)
    params, state = params_from_torch(ckpt["state_dict"], model)
    return model, params, state, args


# ---------------------------------------------------------------------------
# nisqa_tpu pytree  ->  torch state_dict (export)
# ---------------------------------------------------------------------------


def params_to_torch(model, params, state) -> dict:
    """Inverse of :func:`params_from_torch`; returns {name: np.ndarray}."""
    import numpy as np

    cfg = model.cfg
    sd = {}

    def put_lin(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["w"]).T.copy()
        sd[f"{prefix}.bias"] = np.asarray(p["b"]).copy()

    def put_conv(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1).copy()
        sd[f"{prefix}.bias"] = np.asarray(p["b"]).copy()

    def put_bn(prefix, p, s):
        sd[f"{prefix}.weight"] = np.asarray(p["scale"]).copy()
        sd[f"{prefix}.bias"] = np.asarray(p["bias"]).copy()
        sd[f"{prefix}.running_mean"] = np.asarray(s["mean"]).copy()
        sd[f"{prefix}.running_var"] = np.asarray(s["var"]).copy()
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)

    def put_norm(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["scale"]).copy()
        sd[f"{prefix}.bias"] = np.asarray(p["bias"]).copy()

    cnn_model = cfg.get("cnn_model") or "skip"
    cp, cs = params["cnn"], state["cnn"]
    if cnn_model in ("adapt", "standard"):
        for i in range(1, 7):
            put_conv(f"cnn.model.conv{i}", cp[f"conv{i}"])
            put_bn(f"cnn.model.bn{i}", cp[f"bn{i}"], cs[f"bn{i}"])
        if "fc" in cp:
            put_lin(f"cnn.model.{'fc' if cnn_model == 'adapt' else 'fc_out'}", cp["fc"])
    elif cnn_model == "dff":
        for i in range(1, 5):
            put_lin(f"cnn.model.lin{i}", cp[f"lin{i}"])
        for i in range(1, 6):
            put_bn(f"cnn.model.bn{i}", cp[f"bn{i}"], cs[f"bn{i}"])
    else:
        put_bn("cnn.model.bn", cp["bn"], cs["bn"])
        if "fc" in cp:
            put_lin("cnn.model.linear", cp["fc"])

    def put_td(prefix_torch, prefix_cfg, tp):
        kind = cfg.get(prefix_cfg) or "skip"
        if kind == "self_att":
            put_lin(f"{prefix_torch}.model.linear", tp["linear"])
            put_norm(f"{prefix_torch}.model.norm1", tp["norm1"])
            if cfg.get(f"{prefix_cfg}_sa_pos_enc"):
                # the reference registers the sinusoidal table as a buffer
                # with seq-first layout (max_len, 1, d_model)
                # (`NISQA_lib.py:1042-1062`); strict load expects the key
                from ..models.td import positional_encoding_table

                d_model = np.asarray(tp["norm1"]["scale"]).shape[0]
                pe = positional_encoding_table(d_model)
                sd[f"{prefix_torch}.model.pos_encoder.pe"] = pe[:, None, :].copy()
            for i, layer in enumerate(tp["layers"]):
                lp = f"{prefix_torch}.model.layers.{i}"
                sd[f"{lp}.self_attn.in_proj_weight"] = np.asarray(layer["attn"]["w_in"]).T.copy()
                sd[f"{lp}.self_attn.in_proj_bias"] = np.asarray(layer["attn"]["b_in"]).copy()
                sd[f"{lp}.self_attn.out_proj.weight"] = np.asarray(layer["attn"]["w_out"]).T.copy()
                sd[f"{lp}.self_attn.out_proj.bias"] = np.asarray(layer["attn"]["b_out"]).copy()
                put_lin(f"{lp}.linear1", layer["linear1"])
                put_lin(f"{lp}.linear2", layer["linear2"])
                put_norm(f"{lp}.norm1", layer["norm1"])
                put_norm(f"{lp}.norm2", layer["norm2"])
        elif kind == "lstm":
            for l, layer in enumerate(tp["layers"]):
                for dname, suffix in (("fwd", ""), ("bwd", "_reverse")):
                    if dname not in layer:
                        continue
                    d = layer[dname]
                    sd[f"{prefix_torch}.model.lstm.weight_ih_l{l}{suffix}"] = np.asarray(d["w_ih"]).T.copy()
                    sd[f"{prefix_torch}.model.lstm.weight_hh_l{l}{suffix}"] = np.asarray(d["w_hh"]).T.copy()
                    sd[f"{prefix_torch}.model.lstm.bias_ih_l{l}{suffix}"] = np.asarray(d["b_ih"]).copy()
                    sd[f"{prefix_torch}.model.lstm.bias_hh_l{l}{suffix}"] = np.asarray(d["b_hh"]).copy()

    put_td("time_dependency", "td", params["td"])
    put_td("time_dependency_2", "td_2", params["td2"])

    def put_pool(prefix, pp):
        for name in ("linear1", "linear2", "linear3", "linear"):
            if name in pp:
                put_lin(f"{prefix}.{name}", pp[name])

    if model.dim:
        for i, pp in enumerate(params["pools"]):
            put_pool(f"pool_layers.{i}.model", pp)
    else:
        put_pool("pool.model", params["pool"])

    if model.double_ended:
        ap = params.get("align", {})
        if "wq" in ap:
            put_lin("align.att.Wq", ap["wq"])
            put_lin("align.att.Wy", ap["wy"])
            put_lin("align.att.v", ap["v"])
        elif "w" in ap:
            put_lin("align.att.W", ap["w"])
        if "lin" in params.get("fuse", {}):
            put_lin("fuse.lin_fusion", params["fuse"]["lin"])

    return sd


def save_torch_checkpoint(path: str, model, params, state, args: dict, extra: dict | None = None):
    """Write a reference-format .tar checkpoint loadable by the PyTorch NISQA."""
    import torch

    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in params_to_torch(model, params, state).items()}
    payload = {"args": dict(args), "model_state_dict": sd, "model_name": model.name}
    if extra:
        payload.update(extra)
    torch.save(payload, path)
