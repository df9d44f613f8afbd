"""Training-epoch throughput on hardware (SURVEY §6 completeness).

Trains NISQA (AdaptCNN -> SA -> PoolAttFF, the standard v2.0 architecture at
full size) from scratch for a few epochs over the bench corpus (96 files,
3-30 s, synthetic MOS labels) with the reference's training defaults
(Adam, bs=32 here) and reports the best epoch's audio-seconds/sec — the
train-side analog of bench.py (feature extraction + fwd/bwd/Adam all jitted
on device; per-epoch train eval + full validation inference pass included,
exactly like `_train_mos`, `/root/reference/nisqa/NISQA_model.py:83-230`).

Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_corpus  # noqa: E402

# the train bench stays on the recorded 96-file corpus regardless of
# bench.py's default serving-corpus size (the 80/16 split below assumes it)
CORPUS_DIR = "/tmp/nisqa_bench_corpus_v2"


def main():
    total_sec, paths = make_corpus(CORPUS_DIR, n_files=96)
    names = [os.path.basename(p) for p in paths]
    rng = np.random.default_rng(0)
    df = pd.DataFrame({
        "deg": names,
        "db": ["train"] * 80 + ["val"] * 16,
        "mos": rng.uniform(1.0, 5.0, len(names)).round(2),
    })
    csv_path = os.path.join(CORPUS_DIR, "train_bench.csv")
    df.to_csv(csv_path, index=False)

    out_dir = "/tmp/nisqa_train_bench_out"
    os.makedirs(out_dir, exist_ok=True)

    import torch

    ckpt = torch.load("/root/reference/weights/nisqa_mos_only.tar",
                      map_location="cpu", weights_only=False)
    args = dict(ckpt["args"])  # full standard architecture + ms geometry
    args.update({
        "mode": "main", "name": "trbench", "model": "NISQA",
        "pretrained_model": False, "data_dir": CORPUS_DIR,
        "output_dir": out_dir, "csv_file": "train_bench.csv",
        "csv_deg": "deg", "csv_mos_train": "mos", "csv_mos_val": "mos",
        "csv_db_train": ["train"], "csv_db_val": ["val"], "csv_con": None,
        "csv_ref": None,
        "tr_epochs": 4, "tr_early_stop": 50, "tr_bs": 32, "tr_bs_val": 32,
        "tr_lr": 1e-3, "tr_lr_patience": 15, "tr_num_workers": 8,
        "tr_parallel": False, "tr_checkpoint": "best_only", "tr_verbose": 0,
        "tr_bias_mapping": None, "tr_bias_min_r": None,
        "tr_bias_anchor_db": None, "tr_ds_to_memory": True, "seed": 0,
    })

    from nisqa_tpu.model import NisqaTPU
    from nisqa_tpu.train import loop as train_loop

    train_audio = sum(
        os.path.getsize(p) for p in paths[:80]
    ) / (2 * 48000)  # PCM16 mono 48 kHz

    epoch_times = []
    orig_run_epoch = train_loop.TrainEngine.run_epoch

    def timed_run_epoch(self, *a, **k):
        tic = time.time()
        out = orig_run_epoch(self, *a, **k)
        epoch_times.append(time.time() - tic)
        return out

    train_loop.TrainEngine.run_epoch = timed_run_epoch
    runner = NisqaTPU(args)
    tic = time.time()
    runner.train()
    wall = time.time() - tic

    # tools/measure_baseline_train.py: reference torch-CPU bare train loop on
    # the same corpus/arch (conservative denominator — it excludes the eval
    # passes this number includes)
    CPU_TRAIN_BASELINE = 12.5
    best_epoch = min(epoch_times[1:]) if len(epoch_times) > 1 else epoch_times[0]
    value = train_audio / best_epoch
    print(json.dumps({
        "metric": "train_epoch_throughput_nisqa_bs32",
        "value": round(value, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(value / CPU_TRAIN_BASELINE, 2),
        "epoch_sec_best": round(best_epoch, 2),
        "full_loop_sec_4ep": round(wall, 1),
    }))


if __name__ == "__main__":
    main()
