"""NISQA_DE hardware numbers (VERDICT-r4 next #4).

Double-ended was the only model family with no TPU measurement of any kind
(no released DE weights exist). This tool closes that:

  train   train the full-size shipped DE architecture
          (config/train_nisqa_double_ended.yaml: AdaptCNN -> 2x SA(2) ->
          cosine/hard Alignment -> x/y/- Fusion, ~281k params) on a
          synthetic deg/ref corpus with LEARNABLE labels (MOS = f(SNR) of
          the additive noise), then export the best epoch as a
          reference-loadable .tar into tests/goldens/de_trained.tar.
  bench   DE serving throughput on the attached device: double front-end
          (deg+ref), O(T^2) alignment — the heaviest per-batch graph in the
          zoo (`/root/reference/nisqa/NISQA_lib.py:272-424`, align
          :1228-1285). Reports fetched / devrate / async-pipelined rates
          like bench.py, one JSON line.
  parity  self-parity: our engine vs the PyTorch reference NISQA_DE running
          the SAME exported .tar over the same corpus (MAE / max / r).
          measure_parity.corpus_scale includes this config, so the hardware
          drift gate (NISQA_HW_PARITY=1) covers DE from round 5 on.

Corpus: equal-length 8 s 48 kHz pairs (ONE length bucket -> one compiled
shape per program — first remote compiles through the relay are the
dominant cost, docs/RELAY_NOTES.md). ref = clean multi-harmonic tone;
deg = ref + white noise at SNR uniform in [0, 40] dB; mos = 1 + 4*SNR/40.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DE_TAR = os.path.join(REPO, "tests", "goldens", "de_trained.tar")
CORPUS_DIR = "/tmp/nisqa_de_corpus_v1"
N_PAIRS = int(os.environ.get("NISQA_DE_PAIRS") or 96)
DUR_S = 8.0


def make_de_corpus(out_dir=CORPUS_DIR, n_pairs=N_PAIRS, seed=0):
    """Deterministic deg/ref pair corpus. Returns (deg_audio_s, deg_paths,
    ref_paths, mos)."""
    from nisqa_tpu.audio.wav import write_wav

    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    sr = 48000
    n = int(sr * DUR_S)
    t = np.arange(n) / sr
    deg_paths, ref_paths, mos = [], [], []
    for i in range(n_pairs):
        f0 = rng.uniform(100, 300)
        ref = (0.3 * np.sin(2 * np.pi * f0 * t)
               + 0.1 * np.sin(2 * np.pi * 2.05 * f0 * t)
               + 0.05 * np.sin(2 * np.pi * 3.1 * f0 * t)).astype(np.float32)
        snr_db = rng.uniform(0.0, 40.0)
        noise = rng.standard_normal(n).astype(np.float32)
        noise *= np.sqrt((ref ** 2).mean() / (10 ** (snr_db / 10))
                         / (noise ** 2).mean())
        deg = np.clip(ref + noise, -0.999, 0.999)
        rp = os.path.join(out_dir, f"ref_{i:03d}.wav")
        dp = os.path.join(out_dir, f"deg_{i:03d}.wav")
        if not os.path.exists(rp):
            write_wav(rp, ref, sr)
        if not os.path.exists(dp):
            write_wav(dp, deg, sr)
        ref_paths.append(rp)
        deg_paths.append(dp)
        mos.append(round(float(1.0 + 4.0 * snr_db / 40.0), 2))
    return n_pairs * DUR_S, deg_paths, ref_paths, np.array(mos)


def _de_args(epochs, bs, out_dir):
    import yaml

    with open(os.path.join(REPO, "nisqa_tpu", "config",
                           "train_nisqa_double_ended.yaml")) as f:
        args = yaml.load(f, Loader=yaml.FullLoader)
    args.update({
        "mode": "main", "name": "de_bench", "data_dir": CORPUS_DIR,
        "output_dir": out_dir, "csv_file": "de_corpus.csv",
        "csv_deg": "deg", "csv_ref": "ref",
        "csv_mos_train": "mos", "csv_mos_val": "mos",
        "csv_db_train": ["train"], "csv_db_val": ["val"], "csv_con": None,
        "tr_epochs": epochs, "tr_early_stop": 50, "tr_bs": bs,
        "tr_bs_val": bs, "tr_num_workers": 4, "tr_parallel": False,
        "tr_checkpoint": "best_only", "tr_verbose": 0,
        "tr_ds_to_memory": True, "tr_device_cache_mb": 2048, "seed": 0,
    })
    return args


def train(epochs=8, bs=8):
    import pandas as pd

    from nisqa_tpu.model import NisqaTPU

    _, deg, ref, mos = make_de_corpus()
    n_train = N_PAIRS * 5 // 6
    df = pd.DataFrame({
        "deg": [os.path.basename(p) for p in deg],
        "ref": [os.path.basename(p) for p in ref],
        "db": ["train"] * n_train + ["val"] * (N_PAIRS - n_train),
        "mos": mos,
    })
    df.to_csv(os.path.join(CORPUS_DIR, "de_corpus.csv"), index=False)
    out_dir = "/tmp/nisqa_de_train_out"
    os.makedirs(out_dir, exist_ok=True)

    tic = time.time()
    runner = NisqaTPU(_de_args(epochs, bs, out_dir))
    runner.train()
    wall = time.time() - tic

    # export the run's best .tar (best_only keeps one) to the golden path
    runs = sorted((os.path.join(out_dir, d) for d in os.listdir(out_dir)),
                  key=os.path.getmtime)
    tar = None
    for d in reversed(runs):
        tars = [f for f in os.listdir(d) if f.endswith(".tar")]
        if tars:
            tar = os.path.join(d, tars[0])
            break
    assert tar, "training produced no .tar checkpoint"
    import shutil

    shutil.copy(tar, DE_TAR)
    print(json.dumps({"trained": DE_TAR, "epochs": epochs,
                      "wall_s": round(wall, 1)}))


def _engine(bs=32, precision="default"):
    from nisqa_tpu.compat.torch_ckpt import load_model_from_tar
    from nisqa_tpu.data.pipeline import InferenceEngine, MsConfig

    model, params, state, args = load_model_from_tar(DE_TAR)
    return InferenceEngine(model, params, state, MsConfig(args),
                           batch_size=bs, num_workers=8, precision=precision,
                           cache_mb=max(512, N_PAIRS * 8))


def bench():
    total_audio, deg, ref, _ = make_de_corpus()
    eng = _engine()
    eng.warmup(deg, ref)
    runs = []
    y = None
    for i in range(7):
        tic = time.time()
        y = eng.predict_paths(deg, ref)
        runs.append(time.time() - tic)
    assert np.isfinite(y).all()
    dev = []
    for _ in range(3):
        tic = time.time()
        eng.predict_paths(deg, ref, fetch=False)
        dev.append(time.time() - tic)
    async_walls = []
    depth = int(os.environ.get("NISQA_BENCH_ASYNC_DEPTH") or 8)
    for _ in range(3):
        tic = time.time()
        hs = [eng.predict_paths(deg, ref, fetch="async") for _ in range(depth)]
        ys = [h() for h in hs]
        async_walls.append((time.time() - tic) / depth)
        assert all(np.isfinite(v).all() for v in ys)
    print(json.dumps({
        "metric": "predict_de_throughput_bs32",
        # deg-side audio seconds (the reference's unit); the DE pass also
        # front-ends the ref side, so device work is ~2x per audio-second
        "value": round(total_audio / min(async_walls), 2),
        "unit": "audio-sec/sec/chip",
        "fetched_best_pass": round(total_audio / min(runs), 2),
        "fetched_median": round(total_audio / float(np.median(runs[1:])), 2),
        "devrate_best_pass": round(total_audio / min(dev), 2),
        "async_median": round(total_audio / float(np.median(async_walls)), 2),
        "n_pairs": N_PAIRS,
        "total_audio_s": total_audio,
        "cold_pass_rate": round(total_audio / runs[0], 2),
    }))


def parity(record=False):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from measure_parity import de_self_parity

    r = de_self_parity()
    print(json.dumps(r))


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "bench"
    if cmd == "train":
        train(epochs=int(sys.argv[2]) if len(sys.argv) > 2 else 8)
    elif cmd == "bench":
        bench()
    elif cmd == "parity":
        parity()
    else:
        raise SystemExit(f"unknown command {cmd!r} (train|bench|parity)")


if __name__ == "__main__":
    main()
