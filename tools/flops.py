"""Analytic FLOP grounding for bench.py's MFU fields (VERDICT-r4 next #3).

Counts the FLOPs each serving-pass regime actually EXECUTES (bucket padding
included — MFU measures hardware utilization, so padded work counts) using
XLA's own post-optimization cost model:

  * cached pass  = segment windowing + model per plan batch (the front-end
    ran once, on the cold pass — the regime behind the fetched / devrate /
    async numbers);
  * cold extra   = the windowed-DFT + mel front-end per plan batch.

Runs on a FORCED-CPU backend in this throwaway process: cost_analysis needs
``.lower().compile()``, which is forbidden on the relay-attached TPU backend
(docs/RELAY_NOTES.md), and FLOP counts are backend-independent op
arithmetic. bench.py invokes this as a subprocess and caches the JSON
result next to the corpus (keyed by checkpoint + plan signature), so the
CPU compiles happen once per (corpus size, checkpoint).

Usage: python tools/flops.py <ckpt.tar> <corpus_dir> [batch_size]
Prints ONE JSON line:
  {"cached_flops_per_pass", "cold_flops_per_pass", "total_audio_s",
   "n_files", "plan_batches", "flops_per_audio_s_cached"}
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _flops_of(lowered):
    """compiled.cost_analysis() is a dict in current JAX (a list of dicts in
    older releases)."""
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def count_flops(tar, corpus_dir, batch_size=32):
    from nisqa_tpu.compat.torch_ckpt import load_model_from_tar
    from nisqa_tpu.data.pipeline import (
        InferenceEngine, MsConfig, _front_end, front_end_consts,
    )

    model, params, state, args = load_model_from_tar(tar)
    ms = MsConfig(args)
    eng = InferenceEngine(model, params, state, ms, batch_size=batch_size,
                          num_workers=4, pallas_mel=False, cache_mb=0)
    paths = sorted(
        os.path.join(corpus_dir, f) for f in os.listdir(corpus_dir)
        if f.endswith(".wav")
    )
    audio = eng._scan_transport(paths)
    metas = eng._metas_for(audio, None)
    plan = eng._plan_for(metas)
    total_audio_s = sum(
        (e[1] if e[0] in ("native", "native_f32") else len(e[1])) / e[2]
        for e in audio
    )

    bs = eng.batch_size
    n_by_key = {}
    for (sr, bucket, kind), _ in plan:
        n_by_key[(sr, bucket)] = n_by_key.get((sr, bucket), 0) + 1

    cached = cold = 0.0
    de = model.double_ended
    for (sr, bucket), n_batches in sorted(n_by_key.items()):
        F = ms.frames_for_bucket(bucket)
        db = jax.ShapeDtypeStruct((bs, F, ms.n_mels), np.float32)
        n = jax.ShapeDtypeStruct((bs,), np.int32)
        seg_run = eng._seg_pipeline(sr, bucket)
        seg_args = (db, n) * (2 if de else 1)
        f_seg = _flops_of(seg_run.lower(eng.params, eng.state, *seg_args))

        fe, buf_len = _front_end(ms, sr, bucket)  # XLA einsum path: same
        # contraction (and FLOPs) as the Pallas kernel's fused DFT->mel
        consts = front_end_consts(ms, sr, "f32")
        buf = jax.ShapeDtypeStruct((bs, buf_len), np.float32)
        f_mel = _flops_of(jax.jit(fe.mel_fn).lower(consts, buf, n))
        if de:
            f_mel *= 2

        cached += n_batches * f_seg
        cold += n_batches * f_mel

    return {
        "cached_flops_per_pass": cached,
        "cold_flops_per_pass": cached + cold,
        "total_audio_s": round(total_audio_s, 2),
        "n_files": len(paths),
        "plan_batches": len(plan),
        "flops_per_audio_s_cached": round(cached / max(total_audio_s, 1e-9), 1),
    }


def main():
    tar = sys.argv[1]
    corpus_dir = sys.argv[2]
    bs = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    print(json.dumps(count_flops(tar, corpus_dir, bs)))


if __name__ == "__main__":
    main()
