"""Measure end-to-end output parity vs the PyTorch reference.

Runs the full TPU pipeline (wav -> mel -> model) and the reference stack
(torch-cpu model + numpy mel standing in for librosa) on the same synthetic
corpus; reports MOS MAE / max abs diff per released checkpoint. The
BASELINE.json criterion is MAE < 0.01 absolute.

Usage: python tools/measure_parity.py [n_files] [precision] [fe_precision]
(fe_precision: 'exact' default | 'fast' = bf16 single-pass DFT)
"""

import os
import sys
import types

import numpy as np

sys.modules.setdefault("librosa", types.ModuleType("librosa"))
sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch  # noqa: E402

from nisqa import NISQA_lib as NL  # noqa: E402
from nisqa_tpu.audio.melspec import melspec_np  # noqa: E402
from nisqa_tpu.audio.wav import read_wav  # noqa: E402
from nisqa_tpu.compat.model_args import model_args_from_ckpt_args  # noqa: E402
from nisqa_tpu.compat.torch_ckpt import load_model_from_tar  # noqa: E402
from nisqa_tpu.data.pipeline import InferenceEngine, MsConfig  # noqa: E402
from nisqa_tpu.features.segments import segment_np  # noqa: E402

TARS = {
    "nisqa.tar": "NISQA_DIM",
    "nisqa_mos_only.tar": "NISQA",
    "nisqa_tts.tar": "NISQA",
}


def reference_predict(tar, model_name, paths):
    ckpt = torch.load(f"/root/reference/weights/{tar}", map_location="cpu", weights_only=False)
    args = dict(ckpt["args"])
    args["model"] = model_name
    margs = model_args_from_ckpt_args(args)
    if isinstance(margs["cnn_kernel_size"], list):
        margs["cnn_kernel_size"] = tuple(margs["cnn_kernel_size"])
    cls = {"NISQA": NL.NISQA, "NISQA_DIM": NL.NISQA_DIM}[model_name]
    m = cls(**margs)
    m.load_state_dict(ckpt["model_state_dict"], strict=True)
    m.eval()
    outs = []
    for p in paths:
        y, sr = read_wav(p)
        spec = melspec_np(
            y, sr, n_fft=args["ms_n_fft"], hop_s=args["ms_hop_length"],
            win_s=args["ms_win_length"], n_mels=args["ms_n_mels"], fmax=args["ms_fmax"],
        )
        segs, n_wins = segment_np(
            spec, args["ms_seg_length"], args["ms_seg_hop_length"], args["ms_max_segments"]
        )
        with torch.no_grad():
            out = m(torch.from_numpy(segs[None, :, None]), torch.tensor([n_wins]))
        outs.append(out.numpy()[0])
    return np.stack(outs)


def main():
    from bench import CORPUS_DIR, make_corpus

    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    precision = sys.argv[2] if len(sys.argv) > 2 else "default"
    fe_precision = sys.argv[3] if len(sys.argv) > 3 else "exact"
    make_corpus(CORPUS_DIR)
    paths = sorted(
        os.path.join(CORPUS_DIR, f) for f in os.listdir(CORPUS_DIR) if f.endswith(".wav")
    )[:n_files]

    for tar, name in TARS.items():
        model, params, state, args = load_model_from_tar(f"/root/reference/weights/{tar}")
        engine = InferenceEngine(
            model, params, state, MsConfig(args), batch_size=8, num_workers=4,
            precision=precision, fe_precision=fe_precision,
        )
        ours = engine.predict_paths(paths)
        ref = reference_predict(tar, name, paths)
        diff = np.abs(ours - ref)
        print(
            f"{tar:22s} precision={precision:8s} fe={fe_precision:5s} "
            f"MOS MAE={diff[:, 0].mean():.5f} max(all dims)={diff.max():.5f}"
        )


if __name__ == "__main__":
    main()
