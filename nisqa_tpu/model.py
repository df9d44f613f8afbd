"""Runtime orchestrator: config -> model -> datasets -> train/predict/evaluate.

Capability parity with ``nisqaModel`` (`/root/reference/nisqa/NISQA_model.py:
21-1113`) with the same flat args dict, dataset modes (predict_file /
predict_dir / predict_csv / main), checkpoint-args merge semantics, and
output artifacts (NISQA_results.csv, per-run YAML + results CSV,
checkpoints). The execution engine underneath is the TPU pipeline
(data/pipeline.py) instead of DataLoader workers + DataParallel.
"""

from __future__ import annotations

import datetime
import os
from glob import glob
from pathlib import Path

import numpy as np
import pandas as pd
import yaml

from .compat.model_args import model_args_from_ckpt_args
from .compat.torch_ckpt import load_torch_checkpoint, params_from_torch
from .data.dataset import SpeechDataset
from .data.pipeline import InferenceEngine, MsConfig
from .eval.report import eval_results
from .models.nisqa import build_model
from .parallel.mesh import make_mesh


class NisqaTPU:
    """Main runtime object: ``NisqaTPU(args).predict() / .train() / .evaluate()``."""

    def __init__(self, args: dict):
        self.args = dict(args)
        self.args.setdefault("mode", "main")
        self.runinfos = {}
        self._load_model()
        self._load_datasets()
        self.args["now"] = datetime.datetime.today()
        if self.args["mode"] == "main":
            print(yaml.dump({k: v for k, v in self.args.items()}, default_flow_style=None, sort_keys=False))

    # -- model -------------------------------------------------------------

    def _load_model(self):
        import jax

        args = self.args
        # tr_device='cpu' forces the CPU backend (reference semantics,
        # `NISQA_model.py:1041-1045`); only effective before backend init
        if args.get("tr_device") == "cpu":
            try:
                jax.config.update("jax_platforms", "cpu")
            except Exception:
                pass
        ckpt = None
        if args.get("pretrained_model"):
            path = args["pretrained_model"]
            if not os.path.isabs(path):
                path = os.path.join(os.getcwd(), path)
            ckpt = load_torch_checkpoint(path)
            # checkpoint args are the base config; runtime args overwrite
            # (`NISQA_model.py:940-942`)
            merged = dict(ckpt["args"])
            merged.update(self.args)
            self.args = args = merged

        if args.get("model") == "NISQA_DIM":
            args["dim"] = True
            args["csv_mos_train"] = None
            args["csv_mos_val"] = None
        else:
            args["dim"] = False
        if args.get("model") == "NISQA_DE":
            args["double_ended"] = True
        else:
            args["double_ended"] = False
            args["csv_ref"] = None

        self.model_args = model_args_from_ckpt_args(args)
        self.model = build_model(args["model"], self.model_args)
        print("Model architecture: " + args["model"])

        if ckpt is not None:
            self.params, self.state = params_from_torch(ckpt["state_dict"], self.model)
            print("Loaded pretrained model from " + args["pretrained_model"])
        else:
            seed = int(args.get("seed", 0))
            self.params, self.state = self.model.init(jax.random.PRNGKey(seed))

        self.mesh = make_mesh() if args.get("tr_parallel") else None
        self.ms = MsConfig(args)

    def _engine(self, bs_key="tr_bs_val"):
        # cache the engine so compiled pipelines survive across epochs;
        # params/state are refreshed on every call
        if getattr(self, "_engine_cache", None) is None:
            args = self.args
            self._engine_cache = InferenceEngine(
                self.model,
                self.params,
                self.state,
                self.ms,
                batch_size=int(args.get(bs_key) or 1),
                mesh=self.mesh,
                num_workers=int(args.get("tr_num_workers") or 8),
                precision=self._default_precision(),
                # engine tuning surface (absent from the reference; defaults
                # are the measured-best configuration — BASELINE.md)
                pallas_mel=args.get("pallas_mel"),
                # absent/null/true = cached passes fuse into one executable;
                # false disables the cached-pass fusion
                fuse_pass=args.get("fuse_pass"),
                # null-tolerant like the other args (`serving_cache_mb: null`
                # keeps the default; explicit 0 disables the cache)
                cache_mb=(512 if args.get("serving_cache_mb") is None
                          else args["serving_cache_mb"]),
                fe_precision=args.get("fe_precision"),  # None = engine auto
            )
        else:
            self._engine_cache.update_params(self.params, self.state)
        return self._engine_cache

    def _default_precision(self):
        # None -> the engine picks (LSTM models upgrade to 'highest')
        return self.args.get("precision") or None

    def _engine_audio_loader(self):
        """Host audio loader closure (wav decode + optional resample)."""
        ms = self.ms
        from .audio import wav as wavio

        def load(path):
            y, sr = wavio.read_wav(path, channel=ms.channel)
            if ms.sr:
                y = wavio.resample_kaiser(y, sr, int(ms.sr))
                sr = int(ms.sr)
            return y, sr

        return load

    # -- datasets ------------------------------------------------------------

    def _load_datasets(self):
        mode = self.args["mode"]
        if mode == "predict_file":
            self._load_file()
        elif mode == "predict_dir":
            self._load_dir()
        elif mode == "predict_csv":
            self._load_csv_predict()
        elif mode == "main":
            self._load_csv_train()
        else:
            raise NotImplementedError(f"mode not available: {mode}")

    def _mk_ds(self, df, df_con, data_dir, filename_column, mos_column, ref_col=None):
        return SpeechDataset(
            df,
            df_con=df_con,
            data_dir=data_dir,
            filename_column=filename_column,
            mos_column=mos_column,
            filename_column_ref=ref_col,
            dim=self.args["dim"],
            double_ended=self.args["double_ended"],
        )

    def _load_file(self):
        deg = self.args["deg"]
        df = pd.DataFrame([os.path.basename(deg)], columns=["deg"])
        self.ds_val = self._mk_ds(df, None, os.path.dirname(deg), "deg", "predict_only")

    def _load_dir(self):
        # the reference globs *.wav only (`NISQA_model.py:745-777`); *.flac is
        # additionally accepted since the decoder supports it natively, and
        # compressed formats when the system FFmpeg libraries are present
        # (the reference's audioread analog, `NISQA_lib.py:2298-2306`)
        exts = ["*.wav", "*.flac"]
        from .audio import codec

        if codec.available():
            exts += ["*.mp3", "*.ogg", "*.m4a", "*.opus"]
        files = sorted(
            f for e in exts for f in glob(os.path.join(self.args["data_dir"], e))
        )
        df = pd.DataFrame([os.path.basename(f) for f in files], columns=["deg"])
        print(f"# files: {len(df)}")
        if len(df) == 0:
            raise ValueError("No wav/flac files found in data_dir")
        self.ds_val = self._mk_ds(df, None, self.args["data_dir"], "deg", "predict_only")

    def _load_csv_predict(self):
        data_dir = self.args.get("data_dir") or ""
        dfile = pd.read_csv(os.path.join(data_dir, self.args["csv_file"]))
        dcon = None
        if self.args.get("csv_con"):
            dcon = pd.read_csv(os.path.join(data_dir, self.args["csv_con"]))
        self.ds_val = self._mk_ds(
            dfile, dcon, data_dir, self.args["csv_deg"], "predict_only",
            ref_col=self.args.get("csv_ref"),
        )

    def _load_csv_train(self):
        args = self.args
        data_dir = args["data_dir"]
        dfile = pd.read_csv(os.path.join(data_dir, args["csv_file"]))
        requested = list(args["csv_db_train"]) + list(args["csv_db_val"])
        missing = set(requested).difference(dfile.db.unique().tolist())
        if missing:
            raise ValueError(f"Not all dbs found in csv: {missing}")
        df_train = dfile[dfile.db.isin(args["csv_db_train"])].reset_index()
        df_val = dfile[dfile.db.isin(args["csv_db_val"])].reset_index()

        dcon_train = dcon_val = None
        if args.get("csv_con"):
            dcon = pd.read_csv(os.path.join(data_dir, args["csv_con"]))
            dcon_train = dcon[dcon.db.isin(args["csv_db_train"])].reset_index()
            dcon_val = dcon[dcon.db.isin(args["csv_db_val"])].reset_index()

        print(f"Training size: {len(df_train)}, Validation size: {len(df_val)}")
        self.ds_train = self._mk_ds(
            df_train, dcon_train, data_dir, args["csv_deg"],
            args.get("csv_mos_train"), ref_col=args.get("csv_ref"),
        )
        self.ds_val = self._mk_ds(
            df_val, dcon_val, data_dir, args["csv_deg"],
            args.get("csv_mos_val"), ref_col=args.get("csv_ref"),
        )
        self.runinfos["ds_train_len"] = len(self.ds_train)
        self.runinfos["ds_val_len"] = len(self.ds_val)

    # -- public API ----------------------------------------------------------

    def _profiled(self):
        """Optional jax.profiler trace (SURVEY.md §5: the reference has no
        tracing at all; set args['profile_dir'] to capture a device trace)."""
        import contextlib

        trace_dir = self.args.get("profile_dir")
        if not trace_dir:
            return contextlib.nullcontext()
        import jax

        return jax.profiler.trace(trace_dir)

    def predict(self) -> pd.DataFrame:
        print("---> Predicting ...")
        engine = self._engine()
        with self._profiled():
            y_hat = engine.predict_paths(self.ds_val.paths(), self.ds_val.paths_ref())
        self.ds_val.write_predictions(y_hat)
        if self.args.get("output_dir"):
            self.ds_val.df["model"] = self.args["name"]
            self.ds_val.df.to_csv(
                os.path.join(self.args["output_dir"], "NISQA_results.csv"), index=False
            )
        print(self.ds_val.df.to_string(index=False))
        return self.ds_val.df

    def evaluate(self, mapping="first_order", do_print=True, do_plot=False):
        if self.args["dim"]:
            self._evaluate_dim(mapping, do_print, do_plot)
        else:
            self._evaluate_mos(mapping, do_print, do_plot)

    def train(self):
        from .train.loop import train_dim, train_mos

        with self._profiled():
            if self.args["dim"]:
                train_dim(self)
            else:
                train_mos(self)

    # -- evaluation ----------------------------------------------------------

    def _eval_one(self, target, pred, mapping, do_print, do_plot):
        db_results, r = eval_results(
            self.ds_val.df,
            dcon=self.ds_val.df_con,
            target_mos=target,
            target_ci=f"{target}_ci",
            pred=pred,
            mapping=mapping,
            do_print=do_print,
            do_plot=do_plot,
            plot_dir=self.args.get("output_dir"),
        )
        if self.ds_val.df_con is None:
            print(f"r_p_mean_file: {r['r_p_mean_file']:0.2f}, rmse_mean_file: {r['rmse_mean_file']:0.2f}")
        else:
            print(
                f"r_p_mean_con: {r['r_p_mean_con']:0.2f}, rmse_mean_con: {r['rmse_mean_con']:0.2f}, "
                f"rmse_star_map_mean_con: {r['rmse_star_map_mean_con']:0.2f}"
            )
        return db_results, r

    def _evaluate_mos(self, mapping, do_print, do_plot):
        print("--> MOS:")
        self.db_results, self.r = self._eval_one("mos", "mos_pred", mapping, do_print, do_plot)

    def _evaluate_dim(self, mapping, do_print, do_plot):
        targets = [("mos", "MOS"), ("noi", "NOI"), ("dis", "DIS"), ("col", "COL"), ("loud", "LOUD")]
        self.r = {}
        for t, label in targets:
            print(f"--> {label}:")
            db_res, r = self._eval_one(t, f"{t}_pred", mapping, do_print, do_plot)
            setattr(self, f"db_results_val_{t}", db_res)
            self.r.update({(k if t == "mos" else f"{k}_{t}"): v for k, v in r.items()})
        # Printed unconditionally like the reference (NISQA_model.py:707-715):
        # without a condition CSV the con averages are NaN and so is this line.
        r_mean = np.mean(
            [self.r["r_p_mean_con"]] + [self.r[f"r_p_mean_con_{t}"] for t, _ in targets[1:]]
        )
        print(f"\nAverage over MOS and dimensions: r_p={r_mean:0.3f}")

    # -- run artifacts ---------------------------------------------------------

    def _make_runname_and_write_yaml(self):
        runname = self.args["name"] + "_" + self.args["now"].strftime("%y%m%d_%H%M%S%f")
        print("runname: " + runname)
        run_dir = os.path.join(self.args["output_dir"], runname)
        Path(run_dir).mkdir(parents=True, exist_ok=True)
        dump = {k: v for k, v in self.args.items() if k != "now"}
        with open(os.path.join(run_dir, runname + ".yaml"), "w") as f:
            yaml.dump(dump, f, default_flow_style=None, sort_keys=False)
        return runname
