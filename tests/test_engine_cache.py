"""Corpus-adaptive batching plan + device-resident corpus cache.

Round-2 throughput levers (VERDICT r1 #1): the plan must cost ceil(N/bs)
executions per (sr, transport) group, and repeated predict_paths over an
unchanged corpus must reuse device-resident inputs (serving analog of the
reference's `_to_memory`, `/root/reference/nisqa/NISQA_lib.py:2109-2127`)
while staying output-identical and invalidating on file change.
"""

import os
import time

import numpy as np

from tests.test_e2e import TINY_ARGS, _make_ckpt, _write_corpus


def _engine(tmp_path, **kw):
    from nisqa_tpu.compat.torch_ckpt import load_model_from_tar
    from nisqa_tpu.data.pipeline import InferenceEngine, MsConfig

    ckpt = _make_ckpt(tmp_path)
    model, params, state, args = load_model_from_tar(ckpt)
    return InferenceEngine(model, params, state, MsConfig(args),
                           num_workers=2, **kw)


def test_plan_is_one_exec_per_chunk(tmp_path):
    """Single-sr corpus: exactly ceil(N/bs) batches, length-sorted chunks,
    minimal grid bucket per chunk."""
    names = _write_corpus(tmp_path, n=7)
    paths = [str(tmp_path / n) for n in names]
    eng = _engine(tmp_path, batch_size=3)
    audio = eng._scan_transport(paths)
    metas = eng._metas_for(audio, None)
    plan = eng._plan_for(metas)
    assert len(plan) == 3  # ceil(7/3)
    # chunks are length-sorted: first chunk holds the longest files
    nw = {i: m[2] for i, m in zip((m[0] for m in metas), metas)}
    chunk_maxes = [max(nw[i] for i in chunk) for _, chunk in plan]
    assert chunk_maxes == sorted(chunk_maxes, reverse=True)
    grid = eng.ms.buckets()
    for (sr, bucket, kind), chunk in plan:
        assert bucket in grid
        assert bucket >= max(nw[i] for i in chunk)
        # minimal: the next-smaller grid bucket would not fit
        smaller = [b for b in grid if b < bucket]
        if smaller:
            assert max(nw[i] for i in chunk) > smaller[-1]


def test_cache_hit_identical_and_skips_decode(tmp_path, monkeypatch):
    names = _write_corpus(tmp_path, n=5)
    paths = [str(tmp_path / n) for n in names]
    eng = _engine(tmp_path, batch_size=2, cache_mb=256)
    y1 = eng.predict_paths(paths)
    assert len(eng._corpus_cache) == 1

    # second pass must not decode: poison _scan_transport
    def boom(*a, **k):
        raise AssertionError("scan_transport called on a cache hit")

    monkeypatch.setattr(eng, "_scan_transport", boom)
    y2 = eng.predict_paths(paths)
    np.testing.assert_array_equal(y1, y2)
    assert eng.stats["passes"] == 2 and eng.stats["cache_hits"] == 1
    assert eng.stats["last"]["mode"] == "cached"
    assert eng.stats["last"]["files"] == 5


def test_cache_invalidates_on_file_change(tmp_path):
    from nisqa_tpu.audio.wav import write_wav

    names = _write_corpus(tmp_path, n=4)
    paths = [str(tmp_path / n) for n in names]
    eng = _engine(tmp_path, batch_size=2, cache_mb=256)
    y1 = eng.predict_paths(paths)

    # overwrite one file with different audio (bump mtime to defeat
    # same-second timestamp granularity)
    rng = np.random.default_rng(99)
    sr = 8000  # corpus rate (tiny config n_fft bounds the window at 48 kHz)
    n = int(sr * 0.5)
    write_wav(paths[0], (0.2 * rng.standard_normal(n)).astype(np.float32), sr)
    os.utime(paths[0], ns=(time.time_ns(), time.time_ns() + 10_000_000))

    y3 = eng.predict_paths(paths)
    assert np.abs(y3[0] - y1[0]).max() > 1e-4  # recomputed, new audio
    np.testing.assert_allclose(y3[1:], y1[1:], atol=1e-6)  # others unchanged


def test_cache_disabled_when_zero(tmp_path):
    names = _write_corpus(tmp_path, n=3)
    paths = [str(tmp_path / n) for n in names]
    eng = _engine(tmp_path, batch_size=2, cache_mb=0)
    eng.predict_paths(paths)
    assert not eng._corpus_cache


def test_cache_eviction_lru(tmp_path):
    names = _write_corpus(tmp_path, n=4)
    paths = [str(tmp_path / n) for n in names]
    eng = _engine(tmp_path, batch_size=2, cache_mb=256)
    eng.predict_paths(paths[:2])
    eng.predict_paths(paths[2:])
    assert len(eng._corpus_cache) == 2
    # force the cap below current usage: the next (cap-fitting) store must
    # evict oldest entries until the total fits again
    eng.cache_mb = eng._cache_bytes * 0.9 / (1 << 20)
    eng.predict_paths(paths[1:3])  # third, small corpus
    assert len(eng._corpus_cache) <= 2
    assert eng._cache_bytes <= int(eng.cache_mb * (1 << 20))


def test_fuse_pass_true_is_alias_of_default(tmp_path):
    """fuse_pass=True (the legacy flat-audio-fused knob) now maps onto the
    surviving regimes: interleaved cold pass + mel-fused cached passes —
    identical outputs, and repeat cached passes bit-identical."""
    names = _write_corpus(tmp_path, n=6)
    paths = [str(tmp_path / n) for n in names]
    e_plain = _engine(tmp_path, batch_size=2, cache_mb=0)
    e_fused = _engine(tmp_path, batch_size=2, cache_mb=256, fuse_pass=True)
    e_fused.warmup(paths)
    y0 = e_plain.predict_paths(paths)
    y1 = e_fused.predict_paths(paths)  # cold interleaved, builds mel cache
    assert e_fused.stats["last"]["mode"] == "interleaved"
    assert e_fused._corpus_cache
    y2 = e_fused.predict_paths(paths)  # one mel-fused executable
    assert next(iter(e_fused._corpus_cache.values()))["mode"] == "mel_fused"
    y3 = e_fused.predict_paths(paths)
    assert np.abs(y1 - y0).max() < 1e-6
    np.testing.assert_allclose(y2, y1, atol=1e-6)
    np.testing.assert_array_equal(y2, y3)


def _has_mel_fused_pipeline(eng):
    return any(isinstance(k, tuple) and k and k[0] == "mel_fused"
               for k in eng._pipelines)


def test_auto_fuse_cached_pass_matches(tmp_path):
    """Default fuse_pass=None: the cold pass stays interleaved (filler
    overlap) and caches the MEL outputs; cached passes upgrade to ONE fused
    executable over the resident mel blocks (no front-end recompute) —
    output-identical, and repeat cached passes are bit-identical."""
    names = _write_corpus(tmp_path, n=6)
    paths = [str(tmp_path / n) for n in names]
    eng = _engine(tmp_path, batch_size=2, cache_mb=256)
    eng.warmup(paths)  # must pre-compile the fused cached-pass executable
    assert _has_mel_fused_pipeline(eng)
    y1 = eng.predict_paths(paths)
    assert eng.stats["last"]["mode"] == "interleaved"
    assert next(iter(eng._corpus_cache.values()))["mode"] == "mel"
    y2 = eng.predict_paths(paths)
    assert eng.stats["last"]["mode"] == "cached"
    assert "block_s" in eng.stats["last"] and "fetch_s" in eng.stats["last"]
    # entry upgraded to the flat fused-mel layout
    assert next(iter(eng._corpus_cache.values()))["mode"] == "mel_fused"
    y3 = eng.predict_paths(paths)
    np.testing.assert_allclose(y2, y1, atol=1e-6)
    np.testing.assert_array_equal(y2, y3)
    # reference: per-batch (unfused) engine on the same corpus — cached
    # passes run segment+model over the cached mels, same outputs
    e_off = _engine(tmp_path, batch_size=2, cache_mb=256, fuse_pass=False)
    ya = e_off.predict_paths(paths)
    yb = e_off.predict_paths(paths)
    assert not _has_mel_fused_pipeline(e_off)
    np.testing.assert_allclose(yb, ya, atol=1e-6)
    np.testing.assert_allclose(y2, yb, atol=1e-6)


def test_auto_fuse_double_ended_cached(tmp_path):
    """DE corpora also fuse: post-mel everything is f32, so the deg/ref
    blocks flat-pack into the same one-executable cached pass."""
    from nisqa_tpu.compat.torch_ckpt import load_model_from_tar
    from nisqa_tpu.data.pipeline import InferenceEngine, MsConfig
    from tests.test_e2e_de_eval import _make_de_ckpt

    names = _write_corpus(tmp_path, n=8)
    paths = [str(tmp_path / n) for n in names[:4]]
    refs = [str(tmp_path / n) for n in names[4:]]
    ckpt = _make_de_ckpt(tmp_path)
    model, params, state, args = load_model_from_tar(ckpt)
    eng = InferenceEngine(model, params, state, MsConfig(args), batch_size=2,
                          num_workers=1, cache_mb=256)
    y1 = eng.predict_paths(paths, refs)
    assert next(iter(eng._corpus_cache.values()))["mode"] == "mel"
    y2 = eng.predict_paths(paths, refs)
    assert _has_mel_fused_pipeline(eng)
    assert next(iter(eng._corpus_cache.values()))["mode"] == "mel_fused"
    y3 = eng.predict_paths(paths, refs)
    np.testing.assert_allclose(y2, y1, atol=1e-6)
    np.testing.assert_array_equal(y2, y3)


def test_cache_double_ended(tmp_path, monkeypatch):
    """DE corpora cache both deg and ref batches; ref-file changes invalidate."""
    from nisqa_tpu.compat.torch_ckpt import load_model_from_tar
    from nisqa_tpu.data.pipeline import InferenceEngine, MsConfig
    from tests.test_e2e_de_eval import _make_de_ckpt

    names = _write_corpus(tmp_path, n=6)
    paths = [str(tmp_path / n) for n in names[:3]]
    refs = [str(tmp_path / n) for n in names[3:]]
    ckpt = _make_de_ckpt(tmp_path)
    model, params, state, args = load_model_from_tar(ckpt)
    eng = InferenceEngine(model, params, state, MsConfig(args), batch_size=2,
                          num_workers=1, cache_mb=256)
    y1 = eng.predict_paths(paths, refs)
    assert len(eng._corpus_cache) == 1

    def boom(*a, **k):
        raise AssertionError("scan_transport called on a cache hit")

    monkeypatch.setattr(eng, "_scan_transport", boom)
    y2 = eng.predict_paths(paths, refs)
    np.testing.assert_array_equal(y1, y2)
    monkeypatch.undo()
    # touching a REF file must invalidate the fingerprint
    os.utime(refs[0], ns=(time.time_ns(), time.time_ns() + 10_000_000))
    y3 = eng.predict_paths(paths, refs)
    np.testing.assert_allclose(y3, y1, atol=1e-6)  # same audio, recomputed
    assert len(eng._corpus_cache) == 2  # new fingerprint entry


def test_cache_with_mesh_predict(tmp_path):
    """Cached sharded batches reload correctly under a data mesh."""
    from nisqa_tpu.parallel.mesh import make_mesh

    names = _write_corpus(tmp_path, n=5)
    paths = [str(tmp_path / n) for n in names]
    eng = _engine(tmp_path, batch_size=8, cache_mb=256, mesh=make_mesh())
    y1 = eng.predict_paths(paths)
    y2 = eng.predict_paths(paths)
    np.testing.assert_array_equal(y1, y2)
    single = _engine(tmp_path, batch_size=8, cache_mb=0)
    y0 = single.predict_paths(paths)
    assert np.abs(y1 - y0).max() < 1e-5


def test_partial_cache_over_cap(tmp_path, monkeypatch):
    """A corpus bigger than cache_mb keeps the batches that fit resident
    (plan order, longest files first) and records the rest as a cold tail:
    cached passes dispatch residents from their mel blocks and re-decode
    only the tail — scanning ONLY the tail's files. All-or-nothing caching
    would make every pass fully cold here. (The reference's `_to_memory`
    has no cap at all, NISQA_lib.py:2109-2127.)"""
    names = _write_corpus(tmp_path, n=6)
    paths = [str(tmp_path / n) for n in names]
    e0 = _engine(tmp_path, batch_size=2, cache_mb=0)
    y0 = e0.predict_paths(paths)

    # measure the per-batch resident block sizes from a fully-cached engine
    e_full = _engine(tmp_path, batch_size=2, cache_mb=256)
    e_full.predict_paths(paths)
    sizes = [sum(a.nbytes for a in args) for _, _, args in
             next(iter(e_full._corpus_cache.values()))["batches"]]
    assert len(sizes) == 3  # ceil(6/2)

    # cap fits the first two batches but not the third
    cap_mb = (sizes[0] + sizes[1] + 1) / (1 << 20)
    eng = _engine(tmp_path, batch_size=2, cache_mb=cap_mb)
    y1 = eng.predict_paths(paths)
    entry = next(iter(eng._corpus_cache.values()))
    assert entry["mode"] == "mel"
    assert len(entry["batches"]) == 2 and len(entry["cold"]) == 1

    scanned = []
    orig = eng._scan_transport
    monkeypatch.setattr(eng, "_scan_transport",
                        lambda ps: (scanned.append(list(ps)) or orig(ps)))
    y2 = eng.predict_paths(paths)
    assert eng.stats["last"]["mode"] == "cached_partial"
    assert eng.stats["cache_hits"] == 1
    tail_files = {i for _, chunk in entry["cold"] for i in chunk}
    assert scanned and all(len(ps) == len(tail_files) for ps in scanned)
    np.testing.assert_allclose(y2, y1, atol=1e-6)
    np.testing.assert_allclose(y2, y0, atol=1e-6)
    y3 = eng.predict_paths(paths)  # repeat partial passes are bit-identical
    np.testing.assert_array_equal(y2, y3)
    # the entry must never upgrade to mel_fused while a cold tail exists
    assert next(iter(eng._corpus_cache.values()))["mode"] == "mel"


def test_partial_cache_double_ended(tmp_path):
    """DE partial hits re-scan/re-fill the cold tail's deg AND ref files
    (sparse transport lists for both sides)."""
    from nisqa_tpu.compat.torch_ckpt import load_model_from_tar
    from nisqa_tpu.data.pipeline import InferenceEngine, MsConfig
    from tests.test_e2e_de_eval import _make_de_ckpt

    names = _write_corpus(tmp_path, n=8)
    paths = [str(tmp_path / n) for n in names[:4]]
    refs = [str(tmp_path / n) for n in names[4:]]
    ckpt = _make_de_ckpt(tmp_path)
    model, params, state, args = load_model_from_tar(ckpt)

    def de_engine(**kw):
        return InferenceEngine(model, params, state, MsConfig(args),
                               batch_size=2, num_workers=1, **kw)

    y0 = de_engine(cache_mb=0).predict_paths(paths, refs)
    e_full = de_engine(cache_mb=256)
    e_full.predict_paths(paths, refs)
    sizes = [sum(a.nbytes for a in ar) for _, _, ar in
             next(iter(e_full._corpus_cache.values()))["batches"]]
    assert len(sizes) == 2  # ceil(4/2)
    eng = de_engine(cache_mb=(sizes[0] + 1) / (1 << 20))
    y1 = eng.predict_paths(paths, refs)
    entry = next(iter(eng._corpus_cache.values()))
    assert len(entry["batches"]) == 1 and len(entry["cold"]) == 1
    y2 = eng.predict_paths(paths, refs)
    assert eng.stats["last"]["mode"] == "cached_partial"
    np.testing.assert_allclose(y2, y1, atol=1e-6)
    np.testing.assert_allclose(y2, y0, atol=1e-6)
    y3 = eng.predict_paths(paths, refs)
    np.testing.assert_array_equal(y2, y3)


def test_warmup_partial_cache_warms_resident_seg_only(tmp_path):
    """Under the partial regime warmup compiles the per-batch seg+model
    executables (what partial cached passes dispatch), not the fused-mel
    pass (which needs the whole corpus resident)."""
    names = _write_corpus(tmp_path, n=6)
    paths = [str(tmp_path / n) for n in names]
    e_full = _engine(tmp_path, batch_size=2, cache_mb=256)
    e_full.predict_paths(paths)
    sizes = [sum(a.nbytes for a in args) for _, _, args in
             next(iter(e_full._corpus_cache.values()))["batches"]]
    eng = _engine(tmp_path, batch_size=2,
                  cache_mb=(sizes[0] + 1) / (1 << 20))
    eng.warmup(paths)

    def seg_keys(e):
        return [k for k in e._pipelines
                if isinstance(k, tuple) and k and k[0] == "seg"]

    assert seg_keys(eng)
    assert not _has_mel_fused_pipeline(eng)
    # fuse_pass=True is an alias of the default since round 4 (the legacy
    # flat-audio fused regime is gone) — partial-regime warmup behaves
    # identically
    e_fused = _engine(tmp_path, batch_size=2, fuse_pass=True,
                      cache_mb=(sizes[0] + 1) / (1 << 20))
    e_fused.warmup(paths)
    assert seg_keys(e_fused)
    assert not _has_mel_fused_pipeline(e_fused)


def test_warmup_skips_cached_pass_compiles_when_cache_cannot_fit(tmp_path):
    """Cached-pass executables (fused-mel / per-batch seg) can never be
    dispatched when the cache is off or the corpus cannot fit the cap —
    warmup must not compile them (each cold compile is a slow remote
    compile on the relay)."""
    names = _write_corpus(tmp_path, n=5)
    paths = [str(tmp_path / n) for n in names]

    def cached_keys(eng):
        return [k for k in eng._pipelines
                if isinstance(k, tuple) and k and k[0] in ("mel_fused", "seg")]

    for kw in ({"cache_mb": 0}, {"cache_mb": 1e-6}):
        eng = _engine(tmp_path, batch_size=2, **kw)
        eng.warmup(paths)
        assert not cached_keys(eng), (kw, cached_keys(eng))

    eng = _engine(tmp_path, batch_size=2, cache_mb=256)
    eng.warmup(paths)
    assert cached_keys(eng), "default cache must still warm the cached pass"


def test_async_fetch_matches_sync_all_regimes(tmp_path):
    """fetch="async" returns a handle; resolving after dispatching the next
    pass yields results identical to sync fetch, in every regime (cold
    interleaved eager, cached deferred, fused eager, empty corpus)."""
    names = _write_corpus(tmp_path, n=5)
    paths = [str(tmp_path / n) for n in names]

    eng = _engine(tmp_path, batch_size=2, cache_mb=256)
    h_cold = eng.predict_paths(paths, fetch="async")  # cold pass: eager
    y_cold = h_cold()
    # cached passes: readback deferred — dispatch BOTH before resolving
    h1 = eng.predict_paths(paths, fetch="async")
    h2 = eng.predict_paths(paths, fetch="async")
    y1, y2 = h1(), h2()
    y_sync = eng.predict_paths(paths)
    np.testing.assert_array_equal(y_cold, y_sync)
    np.testing.assert_array_equal(y1, y_sync)
    np.testing.assert_array_equal(y2, y_sync)
    assert eng.stats["passes"] == 4 and eng.stats["cache_hits"] == 3

    e_fused = _engine(tmp_path, batch_size=2, cache_mb=256, fuse_pass=True)
    hf = e_fused.predict_paths(paths, fetch="async")  # cold: eager
    np.testing.assert_array_equal(hf(), y_sync)
    hf2 = e_fused.predict_paths(paths, fetch="async")  # mel-fused cached hit
    np.testing.assert_array_equal(hf2(), y_sync)

    h_empty = eng.predict_paths([], fetch="async")
    assert h_empty().shape[0] == 0


def test_async_fetch_partial_cache_resolves_eagerly(tmp_path):
    """A partial-cache pass (cold tail reuses pooled host buffers) must
    resolve inside the call; the handle still returns the right result."""
    from nisqa_tpu.audio.wav import write_wav

    rng = np.random.default_rng(5)
    paths = []
    for i in range(4):
        sr = 8000
        t = np.arange(int(sr * (0.5 + 0.2 * i))) / sr
        y = 0.3 * np.sin(2 * np.pi * (200 + 40 * i) * t)
        p = str(tmp_path / f"p{i}.wav")
        write_wav(p, y.astype(np.float32), sr)
        paths.append(p)
    eng = _engine(tmp_path, batch_size=2, cache_mb=0.02)  # tiny cap
    y_sync = eng.predict_paths(paths)
    if eng.stats["last"]["mode"] == "interleaved":
        y_sync = eng.predict_paths(paths)
    assert eng.stats["last"]["mode"] == "cached_partial"
    h = eng.predict_paths(paths, fetch="async")
    assert eng.stats["last"]["mode"] == "cached_partial"
    np.testing.assert_array_equal(h(), y_sync)


def test_big_plan_fused_parts(tmp_path, monkeypatch):
    """Plans past FUSE_WHOLE_MAX batches fuse in CHUNKS: consecutive
    same-shape resident batches concatenate into one (k*bs, F, M) block and
    dispatch as one bigger-batch segment+model program — identical outputs
    (per-sample compute is independent), bit-identical repeats, and the
    one-executable-per-batch RPC count cut ~k-fold. The whole-plan single
    executable is unchanged for plans <= FUSE_WHOLE_MAX."""
    from nisqa_tpu.audio.wav import write_wav
    from nisqa_tpu.data import pipeline as pl

    # near-equal lengths so every batch lands in the SAME grid bucket and
    # chunks actually merge (k > 1)
    rng = np.random.default_rng(3)
    paths = []
    for i in range(8):
        sr = 8000
        t = np.arange(int(sr * (0.80 + 0.01 * i))) / sr
        y = 0.3 * np.sin(2 * np.pi * (180 + 25 * i) * t) + 0.02 * rng.standard_normal(len(t))
        p = str(tmp_path / f"eq{i}.wav")
        write_wav(p, y.astype(np.float32), sr)
        paths.append(p)

    monkeypatch.setattr(pl, "FUSE_WHOLE_MAX", 2)  # 4 batches > 2 -> parts
    y0 = _engine(tmp_path, batch_size=2, cache_mb=0).predict_paths(paths)

    eng = _engine(tmp_path, batch_size=2, cache_mb=256)
    eng.warmup(paths)
    assert not _has_mel_fused_pipeline(eng)  # big plans never build it
    y1 = eng.predict_paths(paths)  # cold interleaved
    assert next(iter(eng._corpus_cache.values()))["mode"] == "mel"
    y2 = eng.predict_paths(paths)  # upgrade -> chunked fused parts
    entry = next(iter(eng._corpus_cache.values()))
    assert entry["mode"] == "mel_fused_parts"
    # 4 same-shape batches, chunk cap permitting: fewer parts than batches
    assert len(entry["parts"]) < 4
    assert sum(a.shape[0] // eng.batch_size
               for _, a in ((g, ar[0]) for g, ar in entry["parts"])) == 4
    y3 = eng.predict_paths(paths)
    assert eng.stats["last"]["mode"] == "cached"
    np.testing.assert_allclose(y1, y0, atol=1e-6)
    np.testing.assert_allclose(y2, y1, atol=1e-6)
    np.testing.assert_array_equal(y2, y3)

    # async handles work over the parts mode too
    h1 = eng.predict_paths(paths, fetch="async")
    h2 = eng.predict_paths(paths, fetch="async")
    np.testing.assert_array_equal(h1(), y3)
    np.testing.assert_array_equal(h2(), y3)


def test_fuse_chunk_cap_respects_working_set(tmp_path):
    """_fuse_plan_chunks: chunk size shrinks as the bucket (T) grows —
    the per-chunk segment+attention working-set budget is bounded."""
    eng = _engine(tmp_path, batch_size=32)
    small = [((48000, 163, "i16"), list(range(32)))] * 40
    big = [((48000, 1300, "i16"), list(range(32)))] * 40
    k_small = len(eng._fuse_plan_chunks(small)[0])
    k_big = len(eng._fuse_plan_chunks(big)[0])
    assert k_big <= k_small
    assert 1 <= k_big <= 16 and 1 <= k_small <= 16
    # mixed shapes never share a chunk
    mixed = [((48000, 163, "i16"), [0])] * 2 + [((48000, 204, "i16"), [0])] * 2
    chunks = eng._fuse_plan_chunks(mixed)
    for idxs in chunks:
        keys = {mixed[i][0] for i in idxs}
        assert len(keys) == 1
