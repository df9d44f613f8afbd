"""Speech-quality datasets over pandas DataFrames.

Capability parity with `SpeechQualityDataset`
(`/root/reference/nisqa/NISQA_lib.py:2052-2236`) minus torch: the dataset is
a thin host-side view (paths + targets); feature extraction lives on-device
in the batched pipeline (see data/pipeline.py). Targets follow the reference:
single ``mos_column``, the five hardcoded dimension columns for DIM models,
or NaN for predict-only mode.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

DIM_COLS = ("mos", "noi", "dis", "col", "loud")


class SpeechDataset:
    def __init__(
        self,
        df: pd.DataFrame,
        df_con: pd.DataFrame | None = None,
        data_dir: str = "",
        filename_column: str = "deg",
        mos_column: str = "mos",
        filename_column_ref: str | None = None,
        dim: bool = False,
        double_ended: bool = False,
    ):
        self.df = df
        self.df_con = df_con
        self.data_dir = data_dir
        self.filename_column = filename_column
        self.filename_column_ref = filename_column_ref
        self.mos_column = mos_column
        self.dim = dim
        self.double_ended = double_ended

    def __len__(self):
        return len(self.df)

    def paths(self):
        return [os.path.join(self.data_dir, f) for f in self.df[self.filename_column]]

    def paths_ref(self):
        if not self.double_ended:
            return None
        return [os.path.join(self.data_dir, f) for f in self.df[self.filename_column_ref]]

    def targets(self) -> np.ndarray:
        """(N, 5) for dim models, else (N, 1); NaN in predict-only mode."""
        n = len(self.df)
        if self.dim:
            if self.mos_column == "predict_only":
                return np.full((n, 5), np.nan, dtype=np.float32)
            return np.stack(
                [self.df[c].to_numpy(dtype=np.float32) for c in DIM_COLS], axis=1
            )
        if self.mos_column == "predict_only":
            return np.full((n, 1), np.nan, dtype=np.float32)
        return self.df[self.mos_column].to_numpy(dtype=np.float32).reshape(-1, 1)

    def write_predictions(self, y_hat: np.ndarray):
        """Write *_pred columns like the reference predict fns
        (`NISQA_lib.py:1438,1461-1465`)."""
        if self.dim:
            for j, c in enumerate(DIM_COLS):
                self.df[f"{c}_pred"] = y_hat[:, j].astype(float)
        else:
            self.df["mos_pred"] = y_hat[:, 0].astype(float)
