"""nisqa_tpu: TPU-native (JAX/XLA/Pallas) speech-quality prediction framework.

A ground-up reimplementation of the capabilities of gabrielmittag/NISQA:
non-intrusive (single-ended) and full-reference (double-ended) speech quality
prediction (MOS + Noisiness/Coloration/Discontinuity/Loudness dimensions, and
TTS Naturalness), with training, evaluation, and weight-compatible loading of
the released PyTorch checkpoints.
"""

__version__ = "0.1.0"

import os as _os


def _setup_compilation_cache():
    """Persistent XLA compilation cache: first compile of the inference
    pipeline is expensive on TPU; cache it across processes. Opt out with
    NISQA_TPU_NO_CACHE=1."""
    if _os.environ.get("NISQA_TPU_NO_CACHE"):
        return
    cache_dir = _os.environ.get(
        "NISQA_TPU_CACHE_DIR", _os.path.expanduser("~/.cache/nisqa_tpu_xla")
    )
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # CPU executables are AOT-compiled for the build machine's ISA; a
        # shared cache across machine types risks SIGILL on load
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:
        pass


_setup_compilation_cache()


def load_predictor(checkpoint_path: str, batch_size: int = 32, **engine_kwargs):
    """One-call inference API: load a (reference-format) checkpoint and get a
    callable mapping wav paths -> predictions.

    >>> predict = nisqa_tpu.load_predictor("weights/nisqa.tar")
    >>> scores = predict(["a.wav", "b.wav"])   # (2, 5): mos/noi/dis/col/loud
    >>> pairs  = predict(["deg.wav"], ["ref.wav"])  # double-ended models

    The returned callable owns a compiled-engine cache, so repeated calls
    (serving) reuse executables and device-resident weights. Extra kwargs
    reach :class:`nisqa_tpu.data.pipeline.InferenceEngine` (e.g.
    ``precision="highest"``, ``pallas_mel=True``, ``mesh=...``).
    """
    from .compat.torch_ckpt import load_model_from_tar
    from .data.pipeline import InferenceEngine, MsConfig

    model, params, state, args = load_model_from_tar(checkpoint_path)
    engine = InferenceEngine(
        model, params, state, MsConfig(args), batch_size=batch_size, **engine_kwargs
    )

    def predict(paths, paths_ref=None):
        return engine.predict_paths(list(paths), list(paths_ref) if paths_ref else None)

    predict.engine = engine
    predict.model_name = model.name
    return predict
