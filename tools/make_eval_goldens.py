"""Generate evaluation-metric goldens by running the reference's eval stack.

Synthetic per-file + per-condition frames -> reference `eval_results` /
`calc_eval_metrics` / `calc_rmse_star` / `biasLoss` outputs, saved to
tests/goldens/eval_goldens.json for tests/test_eval_parity.py.
"""

import json
import os
import sys
import types

import numpy as np
import pandas as pd

sys.modules.setdefault("librosa", types.ModuleType("librosa"))
sys.path.insert(0, "/root/reference")

from nisqa import NISQA_lib as NL  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens", "eval_goldens.json")


def synth_frames(seed=0, n_db=3, n_con=8, files_per_con=5):
    rng = np.random.default_rng(seed)
    rows, crows = [], []
    for d in range(n_db):
        # numeric db labels: pandas 3 raises on groupby().mean() over string
        # columns, which the reference (pandas 1.x era) relies on
        db = d
        for c in range(n_con):
            con_mos = rng.uniform(1.2, 4.8)
            ci = rng.uniform(0.05, 0.3)
            crows.append({"db": db, "con": c, "mos": con_mos, "mos_ci": ci})
            for f in range(files_per_con):
                mos = np.clip(con_mos + rng.normal(0, 0.3), 1, 5)
                pred = np.clip(0.8 * mos + 0.4 + 0.1 * d + rng.normal(0, 0.25), 0.5, 5)
                rows.append({"db": db, "con": c, "mos": mos, "mos_pred": pred})
    return pd.DataFrame(rows), pd.DataFrame(crows)


def main():
    golden = {}
    df, dcon = synth_frames()
    golden["df"] = df.to_dict(orient="list")
    golden["dcon"] = dcon.to_dict(orient="list")

    for mapping in [None, "first_order", "second_order", "third_order",
                    "third_order_not_monotonic"]:
        for use_con in [False, True]:
            d2 = df.copy()
            db_res, overall = NL.eval_results(
                d2, dcon=dcon.copy() if use_con else None,
                target_mos="mos", target_ci="mos_ci", pred="mos_pred",
                mapping=mapping, do_print=False, do_plot=False,
            )
            key = f"eval_{mapping}_{'con' if use_con else 'file'}"
            golden[key] = {
                "db_results": {
                    c: [None if (isinstance(v, float) and np.isnan(v)) else v
                        for v in db_res[c].tolist()]
                    for c in db_res.columns if c != "db"
                },
                "overall": {k: (None if (isinstance(v, float) and np.isnan(v)) else float(v))
                            for k, v in overall.items()},
            }

    # rmse_star on a known vector
    rng = np.random.default_rng(7)
    a = rng.uniform(1, 5, 30)
    b = np.clip(a + rng.normal(0, 0.4, 30), 1, 5)
    ci = rng.uniform(0.05, 0.4, 30)
    rs, p_err, err = NL.calc_rmse_star(a, b, ci, d=4)
    golden["rmse_star"] = {"a": a.tolist(), "b": b.tolist(), "ci": ci.tolist(),
                           "d": 4, "rmse_star": float(rs)}
    m = NL.calc_eval_metrics(a, b, y_hat_map=b * 0.9 + 0.2, d=1, ci=ci)
    golden["eval_metrics"] = {k: float(v) for k, v in m.items()}

    # biasLoss: coefficients after an update
    import torch

    db_series = pd.Series(["A"] * 20 + ["B"] * 20)
    bl = NL.biasLoss(db_series, anchor_db="B", mapping="first_order", min_r=0.5,
                     do_print=False)
    y = np.concatenate([a[:20], a[:20] * 0.9])
    y_hat = np.clip(y * 0.7 + 0.5 + rng.normal(0, 0.1, 40), 0.3, 5)
    bl.update_bias(y.reshape(-1, 1), y_hat.reshape(-1, 1))
    loss = bl.get_loss(
        torch.tensor(y[:8].reshape(-1, 1), dtype=torch.float),
        torch.tensor(y_hat[:8].reshape(-1, 1), dtype=torch.float),
        np.arange(8),
    )
    golden["bias_loss"] = {
        "y": y.tolist(), "y_hat": y_hat.tolist(),
        "b": bl.b.tolist(), "loss_first8": float(loss),
    }

    with open(OUT, "w") as f:
        json.dump(golden, f)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
