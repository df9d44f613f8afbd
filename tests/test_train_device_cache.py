"""Device-resident training corpus: gather-path epochs must be numerically
identical to the per-batch host-fill path, and must stop touching host audio
after the one-time upload (train analog of the serving corpus cache;
reference `_to_memory`, `/root/reference/nisqa/NISQA_lib.py:2109-2127`)."""

import jax
import numpy as np
import pandas as pd

from tests.test_e2e import TINY_ARGS, _write_corpus


def _args(tmp, out, names, **over):
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {"filename": names, "db": ["T"] * 4 + ["V"] * 2,
         "mos": rng.uniform(1, 5, len(names)).round(2)}
    )
    df.to_csv(tmp / "corpus.csv", index=False)
    return {
        **TINY_ARGS,
        "mode": "main",
        "pretrained_model": False,
        "data_dir": str(tmp),
        "output_dir": str(out),
        "csv_file": "corpus.csv",
        "csv_deg": "filename",
        "csv_mos_train": "mos",
        "csv_mos_val": "mos",
        "csv_db_train": ["T"],
        "csv_db_val": ["V"],
        "csv_con": None,
        "tr_epochs": 2,
        "tr_early_stop": 50,
        "tr_bs": 3,
        "tr_bs_val": 2,
        "tr_lr": 1e-3,
        "tr_lr_patience": 15,
        "tr_num_workers": 0,
        "tr_parallel": False,
        "tr_checkpoint": "every_epoch",
        "tr_verbose": 0,
        "tr_bias_mapping": None,
        "tr_bias_min_r": None,
        "tr_bias_anchor_db": None,
        "seed": 0,
        **over,
    }


def _args_n(tmp, out, names, **over):
    """Like _args but for an arbitrary corpus size: every row trains (the
    partial-residency tests need >= 64 rows — the resident-head
    granularity)."""
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"filename": names, "db": ["T"] * len(names),
                       "mos": rng.uniform(1, 5, len(names)).round(2)})
    df.to_csv(tmp / "corpus.csv", index=False)
    base = _args(tmp, out, names[:6])  # rewrites corpus.csv; redo below
    df.to_csv(tmp / "corpus.csv", index=False)
    return {**base, "csv_db_train": ["T"], "csv_db_val": ["T"], **over}


def _run_epochs(runner, n_epochs=2):
    from nisqa_tpu.train.loop import TrainEngine, _bias_losses

    engine = TrainEngine(runner)
    bias_losses = _bias_losses(runner, 1)
    losses, y_hats = [], []
    rng = jax.random.PRNGKey(7)
    for ep in range(n_epochs):
        rng, rng_ep = jax.random.split(rng)
        loss, y_hat = engine.run_epoch(
            runner.ds_train, bias_losses, 1e-3, rng_ep, batch_size=3
        )
        losses.append(loss)
        y_hats.append(y_hat)
    return engine, losses, y_hats


def _write_equal_corpus(tmp_path, n=6, sr=8000, dur=1.0):
    """All files the same length, so every host-path batch lands in the same
    bucket the resident corpus uses — shapes (and therefore XLA reduction
    trees) match exactly and the two paths must agree bitwise-tight. With
    mixed lengths the paths pick different buckets, which perturbs reduction
    order / dropout draws exactly like the reference's own batch-composition
    sensitivity (covered by the loss/y_hat closeness asserts instead)."""
    from nisqa_tpu.audio.wav import write_wav

    rng = np.random.default_rng(0)
    names = []
    for i in range(n):
        t = np.arange(int(sr * dur)) / sr
        y = 0.4 * np.sin(2 * np.pi * (200 + 60 * i) * t) + 0.05 * rng.standard_normal(len(t))
        name = f"s{i}.wav"
        write_wav(str(tmp_path / name), y.astype(np.float32), sr)
        names.append(name)
    return names


def test_device_corpus_matches_host_path(tmp_path):
    from nisqa_tpu.model import NisqaTPU

    # dropout masks are drawn per tensor position, and the gather path pads
    # time to the corpus-wide bucket, so with dropout active the two paths
    # draw different masks (statistically equivalent, like any change of
    # batch bucket). Zero the dropouts to compare the arithmetic exactly.
    no_drop = {"cnn_dropout": 0.0, "td_sa_dropout": 0.0, "pool_att_dropout": 0.0}
    names = _write_equal_corpus(tmp_path, n=6)
    run_a = NisqaTPU(_args(tmp_path, tmp_path / "a", names,
                           tr_ds_to_memory=True, **no_drop))
    run_b = NisqaTPU(_args(tmp_path, tmp_path / "b", names,
                           tr_ds_to_memory=False, **no_drop))

    eng_a, losses_a, yh_a = _run_epochs(run_a)
    eng_b, losses_b, yh_b = _run_epochs(run_b)

    assert eng_a._dev_corpus, "device corpus should be resident under tr_ds_to_memory"
    assert eng_b._dev_corpus is None or eng_b._dev_corpus == {} or not eng_b._dev_corpus

    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-5, atol=1e-6)
    for ya, yb in zip(yh_a, yh_b):
        np.testing.assert_allclose(ya, yb, rtol=1e-5, atol=1e-6)
    for (ka, pa), (kb, pb) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(run_a.params),
               key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(run_b.params),
               key=lambda kv: str(kv[0])),
    ):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-5, atol=1e-6, err_msg=str(ka))


def test_device_corpus_matches_host_path_de(tmp_path):
    """The double-ended gather branch (resident mel_ref rows, paired
    deg/ref on-device takes) must match the DE host-fill path exactly."""
    from nisqa_tpu.model import NisqaTPU

    no_drop = {"cnn_dropout": 0.0, "td_sa_dropout": 0.0, "pool_att_dropout": 0.0}
    names = _write_equal_corpus(tmp_path, n=6)
    refs = names[1:] + names[:1]  # reuse corpus files as refs, deg != ref

    def de_args(out, **over):
        a = _args(tmp_path, out, names, **over)
        df = pd.read_csv(tmp_path / "corpus.csv")
        df["ref"] = refs
        df.to_csv(tmp_path / "corpus.csv", index=False)
        return {**a, "model": "NISQA_DE", "csv_ref": "ref"}

    run_a = NisqaTPU(de_args(tmp_path / "a", tr_ds_to_memory=True, **no_drop))
    run_b = NisqaTPU(de_args(tmp_path / "b", tr_ds_to_memory=False, **no_drop))

    eng_a, losses_a, yh_a = _run_epochs(run_a, n_epochs=1)
    eng_b, losses_b, yh_b = _run_epochs(run_b, n_epochs=1)

    assert eng_a._dev_corpus, "device corpus should be resident"
    entry = next(iter(eng_a._dev_corpus.values()))
    assert "mel_ref" in entry and entry["kind"] == "f32"

    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-5, atol=1e-6)
    for ya, yb in zip(yh_a, yh_b):
        np.testing.assert_allclose(ya, yb, rtol=1e-5, atol=1e-6)


def test_no_host_audio_after_upload(tmp_path, monkeypatch):
    from nisqa_tpu.model import NisqaTPU
    from nisqa_tpu.train import loop as loop_mod

    names = _write_corpus(tmp_path, n=6)
    runner = NisqaTPU(_args(tmp_path, tmp_path / "o", names, tr_ds_to_memory=True))

    from nisqa_tpu.train.loop import TrainEngine, _bias_losses

    engine = TrainEngine(runner)
    bias_losses = _bias_losses(runner, 1)
    rng = jax.random.PRNGKey(7)
    rng, rng_ep = jax.random.split(rng)
    engine.run_epoch(runner.ds_train, bias_losses, 1e-3, rng_ep, batch_size=3)
    assert engine._dev_corpus

    calls = {"n": 0}
    orig = TrainEngine._audio_f32

    def spy(self, *a, **k):
        calls["n"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(TrainEngine, "_audio_f32", spy)
    rng, rng_ep = jax.random.split(rng)
    engine.run_epoch(runner.ds_train, bias_losses, 1e-3, rng_ep, batch_size=3)
    assert calls["n"] == 0, "epoch 2 must not touch host audio (corpus is resident)"

    # and the host RAM copies were released when the group went resident:
    # transport tuples became light ('meta', n, sr) stubs and the per-path
    # decoded-audio cache holds nothing for corpus files
    paths = runner.ds_train.paths()
    entries = engine._entries(paths)
    assert all(e[0] == "meta" for e in entries)
    assert not any(p in engine._audio_cache for p in paths)


def test_device_corpus_over_mesh(tmp_path):
    """Resident corpus replicated over the 8-device DP mesh; ragged batches
    gather rows with a sharded id vector (pad rows repeat id 0, BN-masked)."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from nisqa_tpu.model import NisqaTPU

    names = _write_corpus(tmp_path, n=6)
    runner = NisqaTPU(_args(tmp_path, tmp_path / "m", names,
                            tr_ds_to_memory=True, tr_parallel=True))
    engine, losses, y_hats = _run_epochs(runner, n_epochs=1)
    assert engine.mesh is not None and engine._dev_corpus
    assert np.isfinite(losses[0])
    assert np.isfinite(y_hats[0]).all()


def test_cap_falls_back_to_host_fill(tmp_path):
    from nisqa_tpu.model import NisqaTPU

    names = _write_corpus(tmp_path, n=6)
    runner = NisqaTPU(_args(tmp_path, tmp_path / "c", names,
                            tr_ds_to_memory=True, tr_device_cache_mb=1e-4))
    engine, losses, _ = _run_epochs(runner, n_epochs=1)
    assert engine._dev_corpus == {}
    assert np.isfinite(losses[0])


def test_too_long_file_raises_reference_error(tmp_path):
    """A file exceeding ms_max_segments must raise the reference's
    actionable max-length error (NISQA_lib.py:2205-2207), not a bare
    StopIteration from bucket selection."""
    import pytest

    from nisqa_tpu.audio.wav import write_wav
    from nisqa_tpu.model import NisqaTPU

    names = _write_corpus(tmp_path, n=5)
    sr = 8000
    y = 0.1 * np.random.default_rng(1).standard_normal(int(sr * 3.0))
    write_wav(str(tmp_path / "long.wav"), y.astype(np.float32), sr)
    names.insert(0, "long.wav")  # first 4 rows are the TRAIN split
    runner = NisqaTPU(_args(tmp_path, tmp_path / "l", names,
                            tr_ds_to_memory=True))
    with pytest.raises(ValueError, match="ms_max_segments"):
        _run_epochs(runner, n_epochs=1)


def test_partial_device_corpus_matches_full(tmp_path, capfd):
    """Corpus mels straddling tr_device_cache_mb (VERDICT-r4 next #2): the
    longest-file head stays resident in 64-row granularity, the tail
    host-fills per batch, an advisory names the cap for full residency —
    and with equal lengths + no dropout + ordered batches the partial run
    is numerically identical to the fully-resident one (resident batches
    take the gather path, tail batches the host-fill path, both already
    pinned equal to each other by the tests above)."""
    import jax

    from nisqa_tpu.data.pipeline import MsConfig
    from nisqa_tpu.model import NisqaTPU
    from nisqa_tpu.train.loop import TrainEngine, _bias_losses

    no_drop = {"cnn_dropout": 0.0, "td_sa_dropout": 0.0, "pool_att_dropout": 0.0}
    n, sr, dur = 80, 8000, 1.0
    names = _write_equal_corpus(tmp_path, n=n, sr=sr, dur=dur)

    # cap sized to hold 70 rows -> 64-row head resident, 16-row tail
    ms = MsConfig({**TINY_ARGS})
    nw = ms.n_wins(ms.n_frames(int(sr * dur), sr))
    row_bytes = ms.frames_for_bucket(ms.bucket_for(nw)) * ms.n_mels * 4
    cap_mb = row_bytes * 70 / (1 << 20)

    def args(out, **over):
        return _args_n(tmp_path, out, names, **over)

    def run(runner, n_epochs=1):
        eng = TrainEngine(runner)
        bls = _bias_losses(runner, 1)
        rng = jax.random.PRNGKey(7)
        out = []
        for _ in range(n_epochs):
            rng, rng_ep = jax.random.split(rng)
            out.append(eng.run_epoch(runner.ds_train, bls, 1e-3, rng_ep,
                                     batch_size=8, shuffle=False))
        return eng, out

    run_full = NisqaTPU(args(tmp_path / "f", tr_ds_to_memory=True, **no_drop))
    eng_f, out_f = run(run_full)
    assert len(next(iter(eng_f._dev_corpus.values()))["local"]) == n

    run_part = NisqaTPU(args(tmp_path / "p", tr_ds_to_memory=True,
                             tr_device_cache_mb=cap_mb, **no_drop))
    eng_p, out_p = run(run_part)
    err = capfd.readouterr().err
    assert "64/80 rows (longest files) stay device-resident" in err
    assert "tr_device_cache_mb >=" in err

    entry = next(iter(eng_p._dev_corpus.values()))
    assert len(entry["local"]) == 64 and entry["mel"].shape[0] == 64
    # equal lengths -> stable sort keeps the first 64 indices resident
    assert sorted(entry["local"]) == list(range(64))
    # resident rows released their host audio; tail rows kept theirs
    entries = eng_p._entries(run_part.ds_train.paths())
    assert all(e[0] == "meta" for e in entries[:64])
    assert all(e[0] != "meta" for e in entries[64:])

    # numerically identical to full residency (ordered batches never
    # straddle the 64-row boundary at batch_size 8)
    for (lf, yf), (lp, yp) in zip(out_f, out_p):
        np.testing.assert_allclose(lp, lf, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(yp, yf, rtol=1e-5, atol=1e-6)

    # epoch 2: resident rows must not touch host audio, tail rows host-fill
    rng = jax.random.PRNGKey(9)
    eng_p.run_epoch(run_part.ds_train, _bias_losses(run_part, 1), 1e-3,
                    rng, batch_size=8, shuffle=True)


def test_partial_device_corpus_shuffle_partition(tmp_path):
    """Shuffled epochs under partial residency: the order is stable-
    partitioned (resident rows first), so at most ONE batch straddles and
    splits into a gather step + a host-fill step; steps stay ~batch-size."""
    import jax

    from nisqa_tpu.data.pipeline import MsConfig
    from nisqa_tpu.model import NisqaTPU
    from nisqa_tpu.train.loop import TrainEngine, _bias_losses

    n, sr, dur = 72, 8000, 1.0  # 72 rows: 64 resident + 8 tail
    names = _write_equal_corpus(tmp_path, n=n, sr=sr, dur=dur)
    ms = MsConfig({**TINY_ARGS})
    nw = ms.n_wins(ms.n_frames(int(sr * dur), sr))
    row_bytes = ms.frames_for_bucket(ms.bucket_for(nw)) * ms.n_mels * 4
    runner = NisqaTPU(_args_n(tmp_path, tmp_path / "s", names,
                              tr_ds_to_memory=True,
                              tr_device_cache_mb=row_bytes * 70 / (1 << 20)))
    eng = TrainEngine(runner)
    loss, y_hat = eng.run_epoch(runner.ds_train, _bias_losses(runner, 1),
                                1e-3, jax.random.PRNGKey(3), batch_size=16)
    assert np.isfinite(loss) and np.isfinite(y_hat).all()
    # 72 rows at bs=16 with a 64/8 partition: ceil(64/16) + ceil(8/16) = 5
    # steps — the partition-ordered shuffle prevents per-batch straddling
    # (a plain shuffle would split nearly every batch into two steps)
