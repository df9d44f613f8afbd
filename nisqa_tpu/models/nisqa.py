"""Top-level model families: NISQA, NISQA_DIM, NISQA_DE.

Capability parity with `/root/reference/nisqa/NISQA_lib.py:29-424`, built
the TPU way: params/state are pure pytrees, all shapes static, masking
replaces packed sequences, and the whole forward jits into one XLA program.

  * NISQA      : framewise -> td -> td2 -> pool(1)                -> (B, 1)
  * NISQA_DIM  : shared trunk + 5 pooling heads [mos,noi,dis,col,loud]
                                                                -> (B, 5)
  * NISQA_DE   : Siamese trunk on (deg, ref), alignment of ref to deg,
                 fusion, td2, pool                                -> (B, 1)

``model_args`` uses the reference's exact config keys
(`/root/reference/nisqa/NISQA_model.py:958-1009`) so YAML configs and
checkpoint args work unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import align as A
from . import framewise as F
from . import pooling as P
from . import td as TD

DIM_TARGETS = ("mos", "noi", "dis", "col", "loud")


class NisqaNet:
    """Functional model: ``init(rng) -> (params, state)``, ``apply(...)``.

    ``apply(params, state, x, n_wins, train=False, rng=None) -> (y, state')``
    with x: (B, T, H, S) for single-ended, (B, T, 2, H, S) for double-ended
    (channel 0 = degraded, 1 = reference, matching `NISQA_lib.py:399-404`),
    n_wins: (B,) or (B, 2).
    """

    def __init__(self, name: str, cfg: dict):
        if name not in ("NISQA", "NISQA_DIM", "NISQA_DE"):
            raise NotImplementedError(f"Model not available: {name}")
        self.name = name
        self.cfg = dict(cfg)
        self.double_ended = name == "NISQA_DE"
        self.dim = name == "NISQA_DIM"
        # static structure (stage kinds / fan-outs) is resolved at
        # construction time with a throwaway rng; real params come from init()
        self.init(jax.random.PRNGKey(0), probe_only=True)

    # -- construction -------------------------------------------------------

    def init(self, rng, probe_only=False):
        cfg = self.cfg
        ks = jax.random.split(rng, 10)
        params, state = {}, {}

        params["cnn"], state["cnn"], cnn_fan = F.framewise_init(ks[0], cfg)

        td_def = TD.td_init(ks[1], cnn_fan, cfg, prefix="td")
        self.td_kind, td_fan = td_def["kind"], td_def["fan_out"]
        params["td"] = td_def["params"]

        if self.double_ended:
            align_def = A.alignment_init(
                ks[2], cfg.get("de_align"), q_dim=td_fan, y_dim=td_fan
            )
            self.align_method = align_def["method"]
            params["align"] = align_def["params"]
            fuse = cfg.get("de_fuse")
            fuse_def = A.fusion_init(ks[3], fuse, td_fan, cfg.get("de_fuse_dim"))
            self.fuse_mode = fuse_def["fuse"]
            params["fuse"] = fuse_def["params"]
            td2_in = A.fusion_fan_out(fuse, td_fan, cfg.get("de_fuse_dim"))
        else:
            td2_in = td_fan

        td2_def = TD.td_init(ks[4], td2_in, cfg, prefix="td_2")
        self.td2_kind, td2_fan = td2_def["kind"], td2_def["fan_out"]
        params["td2"] = td2_def["params"]

        pool = cfg.get("pool", "att")
        att_h = cfg.get("pool_att_h")
        if self.dim:
            # the reference sizes DIM heads from td (not td2) fan-out
            # (`NISQA_lib.py:249-258`); identical when td_2 == skip
            head_in = td_fan
            pools = [
                P.pooling_init(jax.random.fold_in(ks[5], i), head_in, 1, pool, att_h)
                for i in range(5)
            ]
            self.pool_kind = pools[0]["kind"]
            params["pools"] = [pd["params"] for pd in pools]
        else:
            pd = P.pooling_init(ks[5], td2_fan, 1, pool, att_h)
            self.pool_kind = pd["kind"]
            params["pool"] = pd["params"]

        if probe_only:
            return {"cnn": cnn_fan, "td": td_fan, "td2": td2_fan}
        return params, state

    # -- forward ------------------------------------------------------------

    def _trunk(self, params, state, segs, n_wins, train, rng, row_valid=None):
        cfg = self.cfg
        r1 = r2 = None
        if rng is not None:
            rng, r1, r2 = jax.random.split(rng, 3)
        feats, cnn_state = F.framewise_apply(
            params["cnn"], state["cnn"], cfg, segs, n_wins, train, r1, row_valid=row_valid
        )
        feats = TD.td_apply({"kind": self.td_kind}, params["td"], cfg, feats, n_wins, "td", train, r2)
        return feats, cnn_state

    def apply(self, params, state, x, n_wins, train=False, rng=None, row_valid=None):
        cfg = self.cfg
        att_drop = float(cfg.get("pool_att_dropout") or 0.0)
        rngs = list(jax.random.split(rng, 8)) if rng is not None else [None] * 8

        if self.double_ended:
            deg, ref = x[:, :, 0], x[:, :, 1]  # (B, T, H, S) each
            n_deg, n_ref = n_wins[:, 0], n_wins[:, 1]
            fd, st_d = self._trunk(params, state, deg, n_deg, train, rngs[0], row_valid)
            fr, st_r = self._trunk(params, state, ref, n_ref, train, rngs[1], row_valid)
            # shared trunk: in train mode both passes update the same BN
            # running stats, serially like torch (deg first, then ref on top:
            # s1 = (1-m)s0 + m*stat_deg; s2 = (1-m)s1 + m*stat_ref). Both
            # passes here were computed from s0, so compose:
            # s2 = st_ref + (1-m)*(st_deg - s0), m = the BN momentum.
            from .modules import BN_MOMENTUM as m
            new_cnn = (
                jax.tree_util.tree_map(
                    lambda r, d, s0: r + (1.0 - m) * (d - s0),
                    st_r, st_d, state["cnn"],
                )
                if train
                else st_d
            )
            aligned = A.alignment_apply(
                {"method": self.align_method, "params": params["align"]},
                fd, fr, n_ref, cfg.get("de_align_apply", "hard"),
            )
            fused = A.fusion_apply({"fuse": self.fuse_mode, "params": params["fuse"]}, fd, aligned)
            h = TD.td_apply({"kind": self.td2_kind}, params["td2"], cfg, fused, n_deg, "td_2", train, rngs[2])
            y = P.pooling_apply({"kind": self.pool_kind}, params["pool"], h, n_deg, att_drop, train, rngs[3])
            return y, {"cnn": new_cnn}

        feats, cnn_state = self._trunk(params, state, x, n_wins, train, rngs[0], row_valid)
        h = TD.td_apply({"kind": self.td2_kind}, params["td2"], cfg, feats, n_wins, "td_2", train, rngs[1])

        if self.dim:
            outs = [
                P.pooling_apply({"kind": self.pool_kind}, p, h, n_wins, att_drop, train, rngs[2 + i])
                for i, p in enumerate(params["pools"])
            ]
            return jnp.concatenate(outs, axis=1), {"cnn": cnn_state}

        y = P.pooling_apply({"kind": self.pool_kind}, params["pool"], h, n_wins, att_drop, train, rngs[2])
        return y, {"cnn": cnn_state}


def build_model(model_name: str, model_args: dict) -> NisqaNet:
    """Factory mirroring `/root/reference/nisqa/NISQA_model.py:1011-1019`."""
    return NisqaNet(model_name, model_args)
