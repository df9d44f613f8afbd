"""Per-database / per-condition evaluation reports.

Behavioural parity with `eval_results` (`/root/reference/nisqa/NISQA_lib.py:
1687-1852`): per-db file-level metrics with a per-db polynomial mapping,
optional per-condition metrics (groupby 'con' means, CI-aware RMSE*),
correlation scatter plots, and the averaged summary keys
(r_p_mean_file, rmse_map_mean_file, ... r_p_all, rmse_all) that the training
loop and early stoppers consume.

Differences by design: plots are saved to files instead of plt.show(), and
pandas group means are computed on the numeric target columns only (pandas
3.x removed silent numeric_only grouping).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from .metrics import apply_poly, eval_metrics, fit_mapping

_FILE_KEYS = ("r_p_file", "rmse_file", "rmse_map_file")
_CON_KEYS = ("r_p_con", "rmse_con", "rmse_map_con", "rmse_star_map_con")


def _con_mean(df_db: pd.DataFrame, col: str) -> np.ndarray:
    return df_db.groupby("con")[col].mean().to_numpy()


def eval_results(
    df: pd.DataFrame,
    dcon: pd.DataFrame | None = None,
    target_mos: str = "mos",
    target_ci: str = "mos_ci",
    pred: str = "mos_pred",
    mapping: str | None = None,
    do_print: bool = False,
    do_plot: bool = False,
    plot_dir: str | None = None,
):
    """Returns (db_results_df, overall_results)."""
    rows = []
    df["y_hat_map"] = np.nan

    for db_name in df.db.astype("category").cat.categories:
        df_db = df.loc[df.db == db_name]
        dcon_db = dcon.loc[dcon.db == db_name] if dcon is not None else None

        r = {k: np.nan for k in _FILE_KEYS + _CON_KEYS}
        y = df_db[target_mos].to_numpy(dtype=np.float64)
        y_hat = df_db[pred].to_numpy(dtype=np.float64)
        have_labels = not np.isnan(y).any()

        b = None
        if have_labels:
            b, d = fit_mapping(y_hat, y, mapping)
            y_hat_map = apply_poly(y_hat, b)
            m = eval_metrics(y, y_hat, y_hat_map=y_hat_map, d=d)
            r["r_p_file"], r["rmse_file"], r["rmse_map_file"] = m["r_p"], m["rmse"], m["rmse_map"]

        b_con = None
        if (dcon_db is not None) and ("con" in df_db.columns):
            y_con = dcon_db[target_mos].to_numpy(dtype=np.float64)
            y_con_hat = _con_mean(df_db, pred)
            if not np.isnan(y_con).any():
                ci_con = (
                    dcon_db[target_ci].to_numpy(dtype=np.float64)
                    if target_ci in dcon_db.columns
                    else None
                )
                b_con, d = fit_mapping(
                    y_hat, y, mapping, con_ids=df_db["con"].to_numpy(), y_con=y_con, ci=ci_con
                )
                mapped = apply_poly(y_hat, b_con)
                df.loc[df.db == db_name, "y_hat_map"] = mapped
                df_db = df.loc[df.db == db_name]
                y_con_hat_map = _con_mean(df_db, "y_hat_map")
                m = eval_metrics(y_con, y_con_hat, y_hat_map=y_con_hat_map, d=d, ci=ci_con)
                r["r_p_con"], r["rmse_con"] = m["r_p"], m["rmse"]
                r["rmse_map_con"], r["rmse_star_map_con"] = m["rmse_map"], m["rmse_star_map"]

        rows.append({"db": db_name, **r})

        if do_plot and have_labels:
            _plot_db(db_name, y, y_hat, b, target_mos, plot_dir, suffix="per_file")
            if b_con is not None:
                _plot_db(
                    db_name, y_con, y_con_hat, b_con, target_mos, plot_dir, suffix="per_con"
                )

        if do_print and have_labels:
            if not np.isnan(r["r_p_con"]):
                print(
                    f"{db_name + ':':<30} r_p_file: {r['r_p_file']:0.2f}, "
                    f"rmse_map_file: {r['rmse_map_file']:0.2f}, r_p_con: {r['r_p_con']:0.2f}, "
                    f"rmse_map_con: {r['rmse_map_con']:0.2f}, rmse_star_map_con: {r['rmse_star_map_con']:0.2f}"
                )
            else:
                print(
                    f"{db_name + ':':<30} r_p_file: {r['r_p_file']:0.2f}, "
                    f"rmse_map_file: {r['rmse_map_file']:0.2f}"
                )

    db_results_df = pd.DataFrame(rows)

    overall = {
        "r_p_mean_file": db_results_df.r_p_file.mean(),
        "rmse_mean_file": db_results_df.rmse_file.mean(),
        "rmse_map_mean_file": db_results_df.rmse_map_file.mean(),
    }
    if dcon is not None:
        overall.update(
            r_p_mean_con=db_results_df.r_p_con.mean(),
            rmse_mean_con=db_results_df.rmse_con.mean(),
            rmse_map_mean_con=db_results_df.rmse_map_con.mean(),
            rmse_star_map_mean_con=db_results_df.rmse_star_map_con.mean(),
        )
    else:
        overall.update(
            r_p_mean_con=np.nan,
            rmse_mean_con=np.nan,
            rmse_map_mean_con=np.nan,
            rmse_star_map_mean_con=np.nan,
        )

    y_all = df[target_mos].to_numpy(dtype=np.float64)
    y_hat_all = df[pred].to_numpy(dtype=np.float64)
    m_all = eval_metrics(y_all, y_hat_all)
    overall["r_p_all"] = m_all["r_p"]
    overall["rmse_all"] = m_all["rmse"]

    return db_results_df, overall


def _plot_db(db_name, y, y_hat, b, target, plot_dir, suffix):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xx = np.arange(0, 6, 0.01)
    yy = apply_poly(xx, b) if b is not None else xx
    plt.figure(figsize=(3.0, 3.0), dpi=150)
    plt.plot(y_hat, y, "o", markersize=2, label="data")
    plt.plot([0, 5], [0, 5], "gray")
    plt.plot(xx, yy, "r", label="fit")
    plt.axis([1, 5, 1, 5])
    plt.gca().set_aspect("equal", adjustable="box")
    plt.grid(True)
    plt.xticks(np.arange(1, 6))
    plt.yticks(np.arange(1, 6))
    plt.title(f"{db_name} {suffix}")
    plt.ylabel(f"Subjective {target.upper()}")
    plt.xlabel(f"Predicted {target.upper()}")
    out_dir = plot_dir or "."
    os.makedirs(out_dir, exist_ok=True)
    plt.savefig(os.path.join(out_dir, f"corr_{db_name}_{suffix}.png"), bbox_inches="tight")
    plt.close()
