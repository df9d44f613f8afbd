"""Training-epoch throughput on hardware (SURVEY §6 completeness).

Trains NISQA (AdaptCNN -> SA -> PoolAttFF, the standard v2.0 architecture at
full size) from scratch for a few epochs over the bench corpus (96 files,
3-30 s, synthetic MOS labels) with the reference's training defaults
(Adam, bs=32 here) and reports the best epoch's audio-seconds/sec — the
train-side analog of bench.py (feature extraction + fwd/bwd/Adam all jitted
on device; per-epoch train eval + full validation inference pass included,
exactly like `_train_mos`, `/root/reference/nisqa/NISQA_model.py:83-230`).

Prints one JSON line.

Options (VERDICT round 2, next #6; round 3, next #6):
  --files N        corpus size (default 96; 384 = the serving bench corpus)
  --precision P    tr_precision A/B: 'highest' (train default) | 'default'
                   (fast bf16-pass matmuls)
  --learnable      label MOS by each file's dominant pitch instead of random
                   noise, so final val r_p/RMSE are meaningful for the
                   precision A/B (reported in the JSON either way)
  --epochs N       epochs (default 4)
  --tts            NISQA-TTS geometry smoke (VERDICT round 3, next #6): the
                   nisqa_tts.tar architecture + ms args (StandardCNN+fc20 ->
                   biLSTM -> last_step_bi; seg_hop=1, ms_max_segments=6000,
                   fmax 8 kHz) trained from scratch over the 10-40 s TTS
                   bench corpus — verifies the fused train step compiles
                   within HBM at the 4,000-6,000-segment buckets and records
                   its a-s/s. --files here = TTS corpus size (default 16).
  --bs N           train batch size (default 32; TTS default 8)
  --cache-mb N     pin tr_device_cache_mb below the corpus's mel bytes to
                   measure the PARTIAL-residency regime (VERDICT round 4,
                   next #2/#8): the longest-file head stays mel-resident,
                   the tail re-decodes + re-uploads each epoch
"""

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import corpus_dir as _corpus_dir, make_corpus  # noqa: E402


def _learnable_mos(paths):
    """MOS from the file's dominant pitch (the synthesis f0 is 100-300 Hz):
    a spectral property the CNN front-end can actually learn, mapped to
    [1, 5]. Estimated, not replayed from the generator, so labels stay
    honest to what is in the audio."""
    from nisqa_tpu.audio.wav import read_wav

    mos = []
    for p in paths:
        y, sr = read_wav(p)
        seg = y[: int(0.5 * sr)].astype(np.float64)
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        lo, hi = int(80 * len(seg) / sr), int(350 * len(seg) / sr)
        f0 = (lo + int(np.argmax(spec[lo:hi]))) * sr / len(seg)
        mos.append(float(np.clip(1.0 + 4.0 * (f0 - 100.0) / 200.0, 1.0, 5.0)))
    return np.round(mos, 2)


def main():
    argv = sys.argv[1:]

    def opt(name, default=None):
        return argv[argv.index(name) + 1] if name in argv else default

    tts = "--tts" in argv
    n_files = int(opt("--files", 16 if tts else 96))
    precision = opt("--precision")
    learnable = "--learnable" in argv
    n_epochs = int(opt("--epochs", 4))
    tr_bs = int(opt("--bs", 8 if tts else 32))

    if tts:
        from bench_tts import CORPUS_DIR as TTS_DIR, make_corpus as make_tts

        corpus_dir = TTS_DIR
        total_sec, paths = make_tts(n_files=n_files)
    else:
        corpus_dir = _corpus_dir(n_files)
        total_sec, paths = make_corpus(corpus_dir, n_files=n_files)
    names = [os.path.basename(p) for p in paths]
    n_train = n_files * 5 // 6
    rng = np.random.default_rng(0)
    df = pd.DataFrame({
        "deg": names,
        "db": ["train"] * n_train + ["val"] * (n_files - n_train),
        "mos": (_learnable_mos(paths) if learnable
                else rng.uniform(1.0, 5.0, len(names)).round(2)),
    })
    csv_path = os.path.join(corpus_dir, "train_bench.csv")
    df.to_csv(csv_path, index=False)

    out_dir = "/tmp/nisqa_train_bench_out"
    os.makedirs(out_dir, exist_ok=True)

    import torch

    base_tar = ("/root/reference/weights/nisqa_tts.tar" if tts
                else "/root/reference/weights/nisqa_mos_only.tar")
    ckpt = torch.load(base_tar, map_location="cpu", weights_only=False)
    args = dict(ckpt["args"])  # full architecture + ms geometry
    args.update({
        "mode": "main", "name": "trbench", "model": "NISQA",
        "pretrained_model": False, "data_dir": corpus_dir,
        "output_dir": out_dir, "csv_file": "train_bench.csv",
        "csv_deg": "deg", "csv_mos_train": "mos", "csv_mos_val": "mos",
        "csv_db_train": ["train"], "csv_db_val": ["val"], "csv_con": None,
        "csv_ref": None,
        "tr_epochs": n_epochs, "tr_early_stop": 50,
        "tr_bs": tr_bs, "tr_bs_val": tr_bs,
        "tr_lr": 1e-3, "tr_lr_patience": 15, "tr_num_workers": 8,
        "tr_parallel": False, "tr_checkpoint": "best_only", "tr_verbose": 0,
        "tr_bias_mapping": None, "tr_bias_min_r": None,
        "tr_bias_anchor_db": None, "tr_ds_to_memory": True, "seed": 0,
        # device corpus cap must hold the full train split: ~6 MB/file of
        # padded i16 at 3-30 s (mel-resident rows are ~5x smaller); TTS
        # clips run 10-40 s (seg_hop=1 -> ~1.9 MB of mel rows per 10 s)
        "tr_device_cache_mb": (
            float(opt("--cache-mb")) if opt("--cache-mb")
            else max(1024, n_files * (24 if tts else 6))),
    })
    if precision:
        args["tr_precision"] = precision

    from nisqa_tpu.model import NisqaTPU
    from nisqa_tpu.train import loop as train_loop

    train_audio = sum(
        os.path.getsize(p) for p in paths[:n_train]
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

    # final val metrics from the run's results CSV (meaningful when
    # --learnable; near-zero r_p expected with random labels)
    final = {}
    runs = sorted(os.listdir(out_dir), key=lambda d: os.path.getmtime(
        os.path.join(out_dir, d)))
    for d in reversed(runs):
        csvs = [f for f in os.listdir(os.path.join(out_dir, d))
                if f.endswith("__results.csv")]
        if csvs:
            hist = pd.read_csv(os.path.join(out_dir, d, csvs[0]))
            final = {
                "final_val_r_p": round(float(hist["r_p_mean_file"].iloc[-1]), 4),
                "final_val_rmse_map": round(float(hist["rmse_map_mean_file"].iloc[-1]), 4),
            }
            break

    print(json.dumps({
        "metric": (f"train_epoch_throughput_nisqa_tts_bs{tr_bs}" if tts
                   else f"train_epoch_throughput_nisqa_bs{tr_bs}"),
        "value": round(value, 2),
        "unit": "audio-sec/sec/chip",
        # the measured CPU denominator is the AdaptCNN+SA architecture;
        # no TTS CPU train baseline exists, so the ratio is omitted there
        **({} if tts else
           {"vs_baseline": round(value / CPU_TRAIN_BASELINE, 2)}),
        "epoch_sec_best": round(best_epoch, 2),
        "files": n_files,
        "tr_device_cache_mb": args["tr_device_cache_mb"],
        "tr_precision": precision or "highest",
        f"full_loop_sec_{n_epochs}ep": round(wall, 1),
        **final,
    }))


if __name__ == "__main__":
    main()
