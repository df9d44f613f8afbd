"""Measure end-to-end output parity vs the PyTorch reference.

Runs the full TPU pipeline (wav -> mel -> model) and the reference stack
(torch-cpu model + numpy mel standing in for librosa) on the same synthetic
corpus; reports MOS MAE / max abs diff per released checkpoint. The
BASELINE.json criterion is MAE < 0.01 absolute.

Usage: python tools/measure_parity.py [n_files] [precision] [fe_precision]
(fe_precision: 'exact' default | 'fast' = bf16 single-pass DFT)

``--corpus``: the corpus-scale run (VERDICT round 2, weak #1 / next #2) —
nisqa.tar + nisqa_mos_only.tar over the FULL 384-file bench corpus at both
'exact' and 'fast' front-end precision, and nisqa_tts.tar over 32 long
(10-40 s, seg_hop=1) TTS clips; reports MAE, max-abs AND Pearson r per
config. Results go to BASELINE.md.

``--corpus --record``: additionally writes the measured numbers to
tests/goldens/parity_corpus.json — the regression baseline that
tests/test_parity_regression.py diffs against (so a parity drift when the
engine changes fails a test, not just a stale BASELINE paragraph).
"""

import json
import os
import sys
import types

import numpy as np

sys.modules.setdefault("librosa", types.ModuleType("librosa"))
sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # tools/ (bench_tts)

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


def reference_predict_de(tar, deg_paths, ref_paths):
    """PyTorch reference NISQA_DE forward over deg/ref pairs, per file —
    the reference dataset's paired layout: segments stacked on the channel
    axis (`NISQA_lib.py:2212-2214`), n_wins per side."""
    ckpt = torch.load(tar, map_location="cpu", weights_only=False)
    args = dict(ckpt["args"])
    margs = model_args_from_ckpt_args(args)
    if isinstance(margs["cnn_kernel_size"], list):
        margs["cnn_kernel_size"] = tuple(margs["cnn_kernel_size"])
    m = NL.NISQA_DE(**margs)
    m.load_state_dict(ckpt["model_state_dict"], strict=True)
    m.eval()
    outs = []
    for dp, rp in zip(deg_paths, ref_paths):
        specs, n_wins = [], []
        for p in (dp, rp):
            y, sr = read_wav(p)
            spec = melspec_np(
                y, sr, n_fft=args["ms_n_fft"], hop_s=args["ms_hop_length"],
                win_s=args["ms_win_length"], n_mels=args["ms_n_mels"],
                fmax=args["ms_fmax"],
            )
            specs.append(spec)
        from nisqa_tpu.features.segments import n_wins_for

        seg_l, seg_h = args["ms_seg_length"], args["ms_seg_hop_length"]
        n_wins = [n_wins_for(s.shape[1], seg_l, seg_h) for s in specs]
        T = max(n_wins)
        segs = [segment_np(s, seg_l, seg_h, T)[0] for s in specs]
        x = np.stack(segs, axis=1)  # (T, 2, M, S)
        with torch.no_grad():
            out = m(torch.from_numpy(x[None]),
                    torch.tensor([n_wins], dtype=torch.long))
        outs.append(out.numpy()[0])
    return np.stack(outs)


def de_self_parity():
    """Self-parity for the trained-here DE checkpoint (VERDICT-r4 next #4):
    our engine vs the torch reference NISQA_DE running the SAME exported
    .tar (tests/goldens/de_trained.tar, produced by tools/bench_de.py
    train) over the deterministic DE pair corpus.

    Measured at BOTH engine precisions (round 5 decomposition): 'highest'
    pins the engine exact (MAE ~3e-6 — the drift-gate entry with the tight
    budget), while 'default' records the honest bf16-pass spread of the
    double-front-end + O(T^2) cosine-alignment graph (~0.012 MOS MAE on
    the trained DE; the alignment's similarity matmuls amplify bf16
    rounding far more than the single-ended stacks' ~0.0015)."""
    from bench_de import DE_TAR, make_de_corpus

    _, deg, ref, _ = make_de_corpus()
    theirs = reference_predict_de(DE_TAR, deg, ref)
    out = {}
    for prec, key in (("default", "de_trained.tar::auto"),
                      ("highest", "de_trained.tar::highest")):
        model, params, state, args = load_model_from_tar(DE_TAR)
        engine = InferenceEngine(model, params, state, MsConfig(args),
                                 batch_size=32, num_workers=4, precision=prec)
        ours = engine.predict_paths(deg, ref)
        diff = np.abs(ours - theirs)
        r = np.corrcoef(ours[:, 0], theirs[:, 0])[0, 1]
        res = {"n": len(deg), "precision": prec, "fe": "auto",
               "mos_mae": float(diff[:, 0].mean()),
               "max_abs": float(diff.max()), "pearson_r": float(r)}
        print(f"de_trained.tar         n={len(deg):3d} precision={prec:8s} "
              f"MOS MAE={res['mos_mae']:.6f} max={res['max_abs']:.6f} "
              f"pearson_r={r:.6f}")
        out[key] = res
    return out


def _compare(tar, name, paths, precision, fe_precision, bs=8, ref_cache={}):
    model, params, state, args = load_model_from_tar(f"/root/reference/weights/{tar}")
    engine = InferenceEngine(
        model, params, state, MsConfig(args), batch_size=bs, num_workers=4,
        precision=precision, fe_precision=fe_precision,
    )
    ours = engine.predict_paths(paths)
    key = (tar, tuple(paths))
    if key not in ref_cache:  # torch-CPU pass is the slow side; reuse across fe modes
        ref_cache[key] = reference_predict(tar, name, paths)
    ref = ref_cache[key]
    diff = np.abs(ours - ref)
    r = np.corrcoef(ours[:, 0], ref[:, 0])[0, 1]
    print(
        f"{tar:22s} n={len(paths):3d} precision={precision:8s} fe={fe_precision:5s} "
        f"MOS MAE={diff[:, 0].mean():.5f} max(all dims)={diff.max():.5f} "
        f"pearson_r(MOS)={r:.6f}"
    )
    return {
        "n": len(paths), "precision": precision, "fe": fe_precision,
        "mos_mae": float(diff[:, 0].mean()), "max_abs": float(diff.max()),
        "pearson_r": float(r),
    }


def corpus_scale(record=False):
    """384-file + long-TTS parity measurement (run on the real TPU)."""
    from bench import CORPUS_DIR, make_corpus

    make_corpus(CORPUS_DIR)
    paths = sorted(
        os.path.join(CORPUS_DIR, f) for f in os.listdir(CORPUS_DIR) if f.endswith(".wav")
    )
    print(f"== corpus-scale parity: {len(paths)} bench files ==")
    results = {}
    for tar, name in (("nisqa.tar", "NISQA_DIM"), ("nisqa_mos_only.tar", "NISQA")):
        for fe in ("exact", "fast"):
            results[f"{tar}::{fe}"] = _compare(tar, name, paths, "default", fe, bs=32)

    from bench_tts import make_corpus as make_tts

    _, tts_paths = make_tts(n_files=32)
    print(f"== long-clip TTS parity: {len(tts_paths)} files of 10-40 s ==")
    results["nisqa_tts.tar::exact"] = _compare(
        "nisqa_tts.tar", "NISQA", tts_paths, "default", "exact", bs=8)

    # DE self-parity (trained-here weights; round 5) — covered whenever the
    # exported golden exists, so the hardware drift gate includes DE
    from bench_de import DE_TAR

    if os.path.exists(DE_TAR):
        print("== double-ended self-parity (trained-here .tar) ==")
        results.update(de_self_parity())

    if record:
        _write_record(results)
    return results


RECORD_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "goldens", "parity_corpus.json")


def _write_record(results):
    import time

    # provenance (VERDICT-r4 next #5): when/where this baseline was
    # measured, so a stale record is visible from the file itself.
    # Keys starting with "_" are skipped by the regression tests.
    results["_meta"] = {
        "recorded": time.strftime("%Y-%m-%d %H:%M:%S"),
        "round": os.environ.get("NISQA_ROUND", "5"),
        "device": _device_name(),
    }
    with open(RECORD_PATH, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"recorded -> {RECORD_PATH}")


def de_record():
    """--de-only --record: re-measure just the DE self-parity entries and
    splice them into the existing record (the DE golden changes whenever
    tools/bench_de.py retrains it; the released-checkpoint entries don't)."""
    with open(RECORD_PATH) as f:
        results = json.load(f)
    results = {k: v for k, v in results.items() if not k.startswith("_")}
    results.update(de_self_parity())
    _write_record(results)


def _device_name():
    try:
        import jax

        return str(jax.devices()[0])
    except Exception:
        return "unknown"


def main():
    from bench import CORPUS_DIR, make_corpus

    if "--de-only" in sys.argv:
        return de_record()
    if "--corpus" in sys.argv:
        return corpus_scale(record="--record" in sys.argv)
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    precision = sys.argv[2] if len(sys.argv) > 2 else "default"
    fe_precision = sys.argv[3] if len(sys.argv) > 3 else "exact"
    make_corpus(CORPUS_DIR)
    paths = sorted(
        os.path.join(CORPUS_DIR, f) for f in os.listdir(CORPUS_DIR) if f.endswith(".wav")
    )[:n_files]
    for tar, name in TARS.items():
        _compare(tar, name, paths, precision, fe_precision)


if __name__ == "__main__":
    main()
