"""TTS-scale hardware benchmark + long-clip parity (VERDICT r1 #5).

Runs the released NISQA-TTS checkpoint (`/root/reference/weights/nisqa_tts.tar`,
StandardCNN+fc20 -> biLSTM -> last_step_bi; ckpt args seg_hop=1,
ms_max_segments=6000, fmax 8 kHz) over a 16-file corpus of 10-40 s clips —
the geometry the standard bench never touches: seg_hop=1 windowing, large
T buckets, LSTM scan at 'highest' precision.

Prints one JSON line:
  {"metric": "predict_dir_throughput_nisqa_tts_bs8", "value", "unit",
   "parity_mos_maxabs": <engine vs torch reference on the longest clips>}

Usage: python tools/bench_tts.py [--parity-only|--bench-only]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS_DIR = "/tmp/nisqa_tts_bench_corpus"
N_FILES = 16


def make_corpus(out_dir=CORPUS_DIR, n_files=N_FILES, seed=3):
    from nisqa_tpu.audio.wav import write_wav

    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    total, paths = 0.0, []
    for i in range(n_files):
        sr = 48000
        dur = float(np.exp(rng.uniform(np.log(10.0), np.log(40.0))))
        n = int(sr * dur)
        p = os.path.join(out_dir, f"tts_{i:02d}.wav")
        if not os.path.exists(p):
            t = np.arange(n) / sr
            f0 = rng.uniform(90, 250)
            y = (
                0.3 * np.sin(2 * np.pi * f0 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 1.7 * t))
                + 0.05 * rng.standard_normal(n)
            )
            write_wav(p, y.astype(np.float32), sr)
        paths.append(p)
        total += n / sr
    return total, paths


def run_bench():
    from nisqa_tpu.compat.torch_ckpt import load_model_from_tar
    from nisqa_tpu.data.pipeline import InferenceEngine, MsConfig

    total, paths = make_corpus()
    model, params, state, args = load_model_from_tar("/root/reference/weights/nisqa_tts.tar")
    engine = InferenceEngine(model, params, state, MsConfig(args), batch_size=8,
                             num_workers=8)
    engine.warmup(paths)
    runs, y = [], None
    for _ in range(5):
        tic = time.time()
        y = engine.predict_paths(paths)
        runs.append(time.time() - tic)
    assert np.isfinite(y).all()
    return total / min(runs), y, paths


def run_parity(paths, y_engine, k=3):
    """Torch-reference MOS on the k longest clips (our numpy mel front-end
    standing in for librosa, as in tools/measure_baseline.py)."""
    import types

    sys.modules.setdefault("librosa", types.ModuleType("librosa"))
    sys.path.insert(0, "/root/reference")
    import torch

    from nisqa import NISQA_lib as NL
    from nisqa_tpu.audio.melspec import melspec_np
    from nisqa_tpu.audio.wav import read_wav
    from nisqa_tpu.compat.model_args import model_args_from_ckpt_args

    ckpt = torch.load("/root/reference/weights/nisqa_tts.tar", map_location="cpu",
                      weights_only=False)
    args = dict(ckpt["args"])
    args.setdefault("model", "NISQA")
    margs = model_args_from_ckpt_args(args)
    if isinstance(margs.get("cnn_kernel_size"), list):
        margs["cnn_kernel_size"] = tuple(margs["cnn_kernel_size"])
    ref = NL.NISQA(**margs)
    ref.load_state_dict(ckpt["model_state_dict"], strict=True)
    ref.eval()

    sizes = [(os.path.getsize(p), i) for i, p in enumerate(paths)]
    longest = [i for _, i in sorted(sizes, reverse=True)[:k]]
    deltas = []
    for i in longest:
        yaud, sr = read_wav(paths[i])
        spec = melspec_np(yaud, sr, n_fft=args["ms_n_fft"], hop_s=args["ms_hop_length"],
                          win_s=args["ms_win_length"], n_mels=args["ms_n_mels"],
                          fmax=args["ms_fmax"])
        x, n_wins = NL.segment_specs(paths[i], torch.from_numpy(spec),
                                     args["ms_seg_length"], args["ms_seg_hop_length"],
                                     args["ms_max_segments"])
        with torch.no_grad():
            mos_ref = float(ref(x[None], torch.as_tensor([int(n_wins)]))[0, 0])
        deltas.append(abs(mos_ref - float(y_engine[i, 0])))
    return max(deltas)


def main():
    import subprocess

    if "--warm-cache-only" in sys.argv:
        from nisqa_tpu.compat.torch_ckpt import load_model_from_tar
        from nisqa_tpu.data.pipeline import InferenceEngine, MsConfig

        _, paths = make_corpus()
        model, params, state, args = load_model_from_tar(
            "/root/reference/weights/nisqa_tts.tar")
        InferenceEngine(model, params, state, MsConfig(args), batch_size=8,
                        num_workers=8).warmup(paths)
        return

    subprocess.run([sys.executable, os.path.abspath(__file__), "--warm-cache-only"],
                   check=True, capture_output=True)
    value, y, paths = run_bench()
    parity = run_parity(paths, y)
    print(json.dumps({
        "metric": "predict_dir_throughput_nisqa_tts_bs8",
        "value": round(value, 2),
        "unit": "audio-sec/sec/chip",
        "parity_mos_maxabs": round(parity, 5),
    }))


if __name__ == "__main__":
    main()
