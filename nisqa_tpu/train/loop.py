"""Training loops (MOS + multidimensional) on the TPU pipeline.

Behavioural parity with `_train_mos` / `_train_dim`
(`/root/reference/nisqa/NISQA_model.py:83-230, 234-569`): Adam + reduce-on-
plateau (rel threshold 0.003) + early stopping + (optional) bias loss, train-
mode predictions collected for the per-epoch train-set evaluation, a full
validation inference pass per epoch, per-epoch results CSV and checkpoints.

TPU design:
  * one jitted train step per (batch, bucket) shape: feature extraction
    (wav -> mel -> segments) runs on-device, then forward/backward/Adam in
    the same dispatch stream; LR is a traced scalar so plateau decay never
    recompiles.
  * NaN-masked MSE per target column (mixed-label corpora train exactly like
    the reference, `NISQA_lib.py:1934-1938`).
  * bias-loss polynomial is evaluated on-device from per-batch (B, K, 4)
    coefficients; the least-squares refits stay on host (tiny).
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from ..data.pipeline import _front_end, validate_filled_row
from ..eval.report import eval_results
from .bias_loss import BiasLoss
from .checkpoint import save_train_state
from .early_stop import EarlyStopper, EarlyStopperDim
from .plateau import ReduceLROnPlateau


def _n_of(e):
    """Sample count of a transport entry: header-scanned ('native',
    'native_f32') and released ('meta') entries carry n directly; decoded
    entries ('i16', 'f32') carry the sample array."""
    return e[1] if e[0] in ("native", "native_f32", "meta") else len(e[1])


def nan_mse(pred, target):
    """Mean squared error over non-NaN targets (`NISQA_lib.py:1934-1938`)."""
    err = pred - target
    ok = ~jnp.isnan(target)
    err = jnp.where(ok, err, 0.0)
    return jnp.sum(err * err) / jnp.maximum(jnp.sum(ok), 1)


class TrainEngine:
    """Per-shape compiled train steps + on-device feature extraction."""

    def __init__(self, runner, loss_weight=0.0):
        self.runner = runner
        self.model = runner.model
        self.ms = runner.ms
        self.loss_weight = float(loss_weight)
        self.opt = optax.scale_by_adam()
        self._step_cache = {}
        self.opt_state = self.opt.init(runner.params)
        # tr_ds_to_memory analog (`NISQA_lib.py:2109-2127`): host-side cache
        # of transport entries + decoded audio for groups that do NOT go
        # device-resident; resident groups release their host audio (their
        # entries become ('meta', n, sr) stubs — see _build_device_corpus)
        self._audio_cache = {} if runner.args.get("tr_ds_to_memory") else None
        # device-resident corpus (train analog of the serving engine's mel
        # cache): per sample rate, ONE (N, F, n_mels) f32 array of
        # precomputed MEL-dB rows, built streaming from 64-row audio chunks;
        # batches gather rows on device and epochs never recompute the
        # front-end. Gated on tr_ds_to_memory; tr_device_cache_mb budgets
        # the MEL bytes (falls back to per-batch host fill when over).
        self._dev_corpus = None
        self._dev_corpus_key = None
        # explicit 0 disables residency (an `or`-default would coerce it)
        cap = runner.args.get("tr_device_cache_mb")
        self._dev_cache_mb = 1024.0 if cap is None else float(cap)
        # data-parallel training over the device mesh (the TPU-native
        # replacement for the reference's nn.DataParallel wrap,
        # `NISQA_model.py:88-89,239-240`): batches shard over 'data',
        # params/optimizer replicate, XLA inserts the gradient psum
        self.mesh = runner.mesh
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            runner.params = jax.device_put(runner.params, rep)
            runner.state = jax.device_put(runner.state, rep)
            self.opt_state = jax.device_put(self.opt_state, rep)
            self._data_sharding = NamedSharding(self.mesh, P("data"))
        else:
            self._data_sharding = None

    def _loader(self):
        base = self.runner._engine_audio_loader()
        if self._audio_cache is None:
            return base
        cache = self._audio_cache

        def load(path):
            hit = cache.get(path)
            if hit is None:
                hit = cache[path] = base(path)
            return hit

        return load

    def _entries(self, paths):
        """Transport descriptors for all paths (native header scans for PCM16
        mono, decoded fallbacks otherwise). Cached across epochs only when
        tr_ds_to_memory is on (matching the reference's RAM-cache semantics)."""
        key = ("entries", tuple(paths))
        if self._audio_cache is not None:
            hit = self._audio_cache.get(key)
            if hit is not None:
                return hit
        entries = self.runner._engine()._scan_transport(list(paths))
        if self._audio_cache is not None:
            self._audio_cache[key] = entries
        return entries

    # -- train step (front-end + fwd/bwd/Adam in ONE program) -----------------

    def _step(self, n_targets, sr, bucket, kind, de, gather=False):
        """One jitted program per (targets, sr, bucket, transport, de): audio
        buffers -> mel -> segments -> forward/backward -> Adam update. Fusing
        the front-end into the step halves dispatches per batch and keeps the
        (B, T, 48, 15) segment tensor out of HBM round trips between
        programs. Front-end tables travel as arguments (consts pytree) — an
        embedded array constant would poison the relay link
        (docs/RELAY_NOTES.md).

        ``gather=True`` is the device-resident-corpus variant: instead of
        per-batch audio buffers the step receives the whole corpus as
        precomputed MEL-dB rows (one (N, F, M) f32 device array per sample
        rate, converted once by :meth:`_build_device_corpus`) plus a (B,)
        row-index vector; the batch is assembled ON DEVICE with a single
        small-index take and the step runs segment windowing + fwd/bwd only
        — the front-end never recomputes across epochs (the reference's
        `_to_memory` caches exactly this per-file mel product,
        `NISQA_lib.py:2109-2127`). Gradients never flow into the front-end
        (audio is data), and the standalone mel program pins the same
        explicit einsum precisions as the fused one, so the split step is
        numerically identical to recomputing the mel in-step."""
        # the gather step consumes precomputed mel rows: the transport kind
        # and the DFT/mel const tables are irrelevant to it, so drop both
        # (keying on kind would compile two byte-identical executables when
        # a corpus flips i16<->f32, ~20 min each on this relay)
        key = (n_targets, sr, bucket, None if gather else kind, de, gather)
        if key in self._step_cache:
            return self._step_cache[key]
        from ..data.pipeline import front_end_consts

        fe, buf_len = _front_end(self.ms, sr, bucket)
        consts = (None if gather
                  else jax.device_put(front_end_consts(self.ms, sr, kind)))
        model = self.model
        opt = self.opt
        loss_weight = self.loss_weight
        # training matmuls default to highest precision: the reference trains
        # in full f32. The round-3 hardware A/B (BASELINE.md) measured
        # tr_precision='default' as learning-equivalent (val r_p/RMSE track
        # to 3 decimals epoch-by-epoch) and ~17% faster per epoch (0.46-0.50 s
        # vs 0.56-0.69 s at 96 files) — a safe opt-in for large corpora via
        # args['tr_precision']; the default keeps the reference's f32
        # semantics since epoch compute is a small share of wall time here.
        precision = self.runner.args.get("tr_precision") or "highest"

        if gather:
            @partial(jax.jit, donate_argnums=(0, 1, 2), static_argnames=())
            def step(params, opt_state, bn_state, fe_consts, y, bias_b,
                     row_valid, lr, rng, *mel_args):
                # mel_args: (mel_corpus, ids, ns[, mel_corpus_r, ids_r, ns_r])
                with jax.default_matmul_precision(precision):
                    db0 = jnp.take(mel_args[0], mel_args[1], axis=0)
                    segs, n_wins = fe.seg_fn(db0, mel_args[2])
                    if de:
                        db1 = jnp.take(mel_args[3], mel_args[4], axis=0)
                        segs_r, n_wins_r = fe.seg_fn(db1, mel_args[5])
                        segs = jnp.stack([segs, segs_r], axis=2)
                        n_wins = jnp.stack([n_wins, n_wins_r], axis=1)
                    return _step_body(params, opt_state, bn_state, segs,
                                      n_wins, y, bias_b, row_valid, lr, rng)
        else:
            @partial(jax.jit, donate_argnums=(0, 1, 2), static_argnames=())
            def step(params, opt_state, bn_state, fe_consts, y, bias_b,
                     row_valid, lr, rng, *audio_args):
                with jax.default_matmul_precision(precision):
                    segs, n_wins = fe(fe_consts, audio_args[0], audio_args[1])
                    if de:
                        segs_r, n_wins_r = fe(fe_consts, audio_args[2],
                                              audio_args[3])
                        segs = jnp.stack([segs, segs_r], axis=2)
                        n_wins = jnp.stack([n_wins, n_wins_r], axis=1)
                    return _step_body(params, opt_state, bn_state, segs,
                                      n_wins, y, bias_b, row_valid, lr, rng)

        def _step_body(params, opt_state, bn_state, segs, n_wins, y, bias_b, row_valid, lr, rng):
            def loss_fn(p):
                # row_valid zeroes mesh-padding rows out of the BN batch
                # statistics (their data duplicates row 0; their loss terms
                # are already NaN-masked)
                y_hat, new_bn = model.apply(p, bn_state, segs, n_wins, train=True,
                                            rng=rng, row_valid=row_valid)
                mapped = (
                    bias_b[..., 0]
                    + bias_b[..., 1] * y_hat
                    + bias_b[..., 2] * y_hat**2
                    + bias_b[..., 3] * y_hat**3
                )
                loss = sum(
                    nan_mse(mapped[:, k], y[:, k])
                    + loss_weight * nan_mse(y_hat[:, k], y[:, k])
                    for k in range(n_targets)
                )
                return loss, (y_hat, new_bn)

            (loss, (y_hat, new_bn)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            # the sinusoidal pos-enc table is a frozen BUFFER in the
            # reference (registered, never trained); zero its grads so Adam
            # leaves it fixed and the exported .tar (which regenerates the
            # pristine table) matches the native checkpoint
            grads = jax.tree_util.tree_map_with_path(
                lambda path, g: jnp.zeros_like(g) if any(
                    getattr(k, "key", None) == "pe" for k in path
                ) else g,
                grads,
            )
            updates, opt_state = opt.update(grads, opt_state)
            params = jax.tree_util.tree_map(lambda p, u: p - lr * u, params, updates)
            return params, opt_state, new_bn, loss, y_hat

        def call(params, opt_state, bn_state, y, bias_b, row_valid, lr, rng,
                 *audio_args, _f=step, _c=consts):
            return _f(params, opt_state, bn_state, _c, y, bias_b, row_valid,
                      lr, rng, *audio_args)

        self._step_cache[key] = (call, buf_len)
        return self._step_cache[key]

    # -- device-resident corpus ------------------------------------------------

    def _audio_f32(self, i, entries, paths, load):
        e = entries[i]
        if e[0] == "meta":
            # host audio for this row was released when its group went
            # device-resident; resident rows must be gathered, not filled
            raise RuntimeError(
                f"host audio for device-resident row {paths[i]} was "
                "released — this row should be served from the mel corpus")
        if e[0] in ("native", "native_f32"):
            return load(paths[i])[0]
        if e[0] == "i16":
            return e[1].astype(np.float32) / 32768.0
        return e[1]

    def _preload_threads(self):
        """Thread count for the one-time corpus preload. Honors the
        reference's ``tr_ds_to_memory_workers`` arg (Pool size of its
        `_to_memory` RAM preload, `NISQA_model.py:886` ->
        `NISQA_lib.py:2109-2127`); 0/None falls back to tr_num_workers."""
        w = self.runner.args.get("tr_ds_to_memory_workers")
        if w:
            return max(1, int(w))
        return max(1, int(self.runner.args.get("tr_num_workers") or 4))

    def _fill_rows_f32(self, buf, items, entries, paths, load, n_threads=None):
        """Fill float32 transport rows for ``items`` = [(row_j, file_i)].

        Natively-scanned entries ride the threaded C++ decoder
        (native.fill_batch_f32 — any WAV flavor + FLAC16-mono, bit-identical
        to the numpy path); the rest decode in Python. Returns {row_j: n}."""
        from ..audio.melspec import pad_audio_for_batch

        ms = self.ms
        pad = ms.n_fft // 2
        out_n = {}
        nat = [(j, i) for j, i in items if entries[i][0] in ("native", "native_f32")]
        rest = [(j, i) for j, i in items if entries[i][0] not in ("native", "native_f32")]
        if nat:
            from ..data import native

            # direct in-place fill when the rows are the whole buffer in
            # order (the common case); scratch block otherwise
            direct = len(nat) == buf.shape[0] and all(j == r for r, (j, _) in enumerate(nat))
            target = buf if direct else np.zeros((len(nat), buf.shape[1]), np.float32)
            if n_threads is None:
                n_threads = max(1, int(self.runner.args.get("tr_num_workers") or 4))
            ns, srs, status = native.fill_batch_f32(
                [paths[i] for _, i in nat], target, pad, channel=ms.channel,
                n_threads=n_threads,
            )
            for row, (j, i) in enumerate(nat):
                if status[row] == 0:
                    validate_filled_row(ms, paths[i], ns[row],
                                        entries[i][2], srs[row])
                    if not direct:
                        buf[j] = target[row]
                    out_n[j] = int(ns[row])
                else:  # rare race: decode this file in Python below
                    rest.append((j, i))
        for j, i in rest:
            y = self._audio_f32(i, entries, paths, load)
            validate_filled_row(ms, paths[i], len(y), entries[i][2])
            padded = pad_audio_for_batch(y, ms.n_fft, len(y) + ms.n_fft)
            w = min(len(padded), buf.shape[1])
            buf[j, :w] = padded[:w]
            out_n[j] = len(y)
        return out_n

    def _build_device_corpus(self, paths, entries, paths_ref, entries_ref, de, load):
        """Make the whole training corpus device-resident once, grouped by
        sample rate at that rate's max length bucket — as precomputed MEL-dB
        rows: audio is decoded on host (i16 transport when every file is
        plain PCM16 mono and the model is single-ended, f32 otherwise),
        uploaded in chunks, pushed through the front-end on device, and only
        the (N, F, n_mels) f32 mel rows are kept (~5x smaller than the i16
        audio, and epochs never recompute the DFT — the reference's
        `_to_memory` caches the same per-file mel product,
        `NISQA_lib.py:2109-2127`). Returns
        {sr: {mel, n, local, bucket[, mel_ref, n_ref]}} covering the rows
        whose MEL fits under tr_device_cache_mb.

        PARTIAL residency (the training mirror of serving's round-4 greedy,
        `pipeline._resident_split`): an sr group whose mel rows exceed the
        remaining budget keeps its LONGEST-file head resident (in 64-row
        granularity, so the gather executable stays shape-reusable) and the
        short-file tail host-fills per batch every epoch — all-or-nothing
        would re-decode and re-upload the WHOLE corpus per epoch the moment
        it outgrew the budget. Longest-first mirrors serving's rationale:
        long rows pack the most audio-seconds per resident MB, and the tail
        then re-uploads the fewest bytes. run_epoch batches resident and
        tail rows separately (see its partition note)."""
        ms = self.ms
        by_sr = {}
        for i, e in enumerate(entries):
            by_sr.setdefault(e[2], []).append(i)

        def rep(a):
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                return jax.device_put(a, NamedSharding(self.mesh, P()))
            return jax.device_put(a)

        budget = int(self._dev_cache_mb * (1 << 20))
        out = {}
        for sr, gidx in sorted(by_sr.items()):
            nw = [ms.n_wins(ms.n_frames(_n_of(entries[i]), sr)) for i in gidx]
            if de:
                nw = [max(a, ms.n_wins(ms.n_frames(_n_of(entries_ref[i]), sr)))
                      for a, i in zip(nw, gidx)]
            # bucket_for raises the reference's actionable max-length error
            # (NISQA_lib.py:2205-2207) on over-long files
            bucket = ms.bucket_for(max(nw))
            # pad the corpus row count to a 64 granularity: the gather
            # train step traces on the corpus array's shape, so padding makes
            # the compiled executable reusable across corpora of similar
            # size (first-epoch remote compiles cost ~20 min/shape on this
            # relay, docs/RELAY_NOTES.md). Pad rows are never gathered.
            n_rows = -(-len(gidx) // 64) * 64
            # the budget gates what stays RESIDENT: the mel rows (the audio
            # chunks uploaded during conversion are transient)
            row_bytes = (ms.frames_for_bucket(bucket) * ms.n_mels * 4
                         * (2 if de else 1))
            nbytes = n_rows * row_bytes
            if nbytes > budget:
                # partial residency: keep the longest-file head (64-row
                # granularity); the tail stays on the host-fill path
                n_keep = min(len(gidx), (budget // row_bytes) // 64 * 64)
                need_mb = -(-(n_rows * row_bytes) // (1 << 20))
                if n_keep <= 0:
                    print(
                        f"nisqa_tpu: training corpus mels (sr {sr}) exceed "
                        f"tr_device_cache_mb ({self._dev_cache_mb:.0f} MB) "
                        f"and not even a 64-row head fits: 0/{len(gidx)} "
                        f"rows device-resident, every epoch re-decodes and "
                        f"re-uploads. Full residency needs "
                        f"tr_device_cache_mb >= {need_mb}.",
                        file=sys.stderr,
                    )
                    continue
                order = sorted(range(len(gidx)), key=lambda j: (-nw[j], j))
                gidx = [gidx[o] for o in order[:n_keep]]
                n_rows = n_keep  # already a 64 multiple
                nbytes = n_rows * row_bytes
                print(
                    f"nisqa_tpu: training corpus mels (sr {sr}) exceed "
                    f"tr_device_cache_mb ({self._dev_cache_mb:.0f} MB): "
                    f"{n_keep}/{len(order)} rows (longest files) stay "
                    f"device-resident, the tail host-fills per epoch. Full "
                    f"residency needs tr_device_cache_mb >= {need_mb}.",
                    file=sys.stderr,
                )
            kind = ("i16" if not de and all(entries[i][0] == "native" for i in gidx)
                    else "f32")

            mel, ns, all_i16 = self._mel_corpus(entries, paths, gidx, sr,
                                                bucket, kind == "i16", n_rows,
                                                rep, load)
            if kind == "i16" and not all_i16:
                kind = "f32"  # rare native-fill race: some rows took f32
            entry = {
                "mel": mel, "n": ns, "bucket": bucket, "kind": kind,
                "local": {int(i): j for j, i in enumerate(gidx)},
            }
            if de:
                mel_r, ns_r, _ = self._mel_corpus(entries_ref, paths_ref,
                                                  gidx, sr, bucket, False,
                                                  n_rows, rep, load)
                entry["mel_ref"] = mel_r
                entry["n_ref"] = ns_r
            out[sr] = entry
            budget -= nbytes
            # The resident mel rows supersede every host copy of this
            # group's audio: drop the per-path decoded-audio cache AND the
            # sample payloads embedded in fallback transport tuples (with
            # ms_sr resampling that is the WHOLE corpus). Rows become light
            # ('meta', n, sr) stubs — n/sr/grouping still work, the kind for
            # these rows comes from the resident entry, and they are never
            # host-filled while the corpus stays resident. Net host RAM
            # while training: ~zero audio (the reference's `_to_memory`
            # holds every mel in host RAM for the whole run).
            for i in gidx:
                self._audio_cache.pop(paths[i], None)
                entries[i] = ("meta", _n_of(entries[i]), sr)
                if de:
                    self._audio_cache.pop(paths_ref[i], None)
                    entries_ref[i] = ("meta", _n_of(entries_ref[i]), sr)
        return out

    def _mel_prog(self, sr, bucket, kind):
        from ..data.pipeline import front_end_consts

        fe, _ = _front_end(self.ms, sr, bucket)
        ckey = ("melconv", sr, bucket, kind)
        if ckey not in self._step_cache:
            consts = jax.device_put(front_end_consts(self.ms, sr, kind))
            self._step_cache[ckey] = (jax.jit(fe.mel_fn), consts)
        return self._step_cache[ckey]

    def _mel_corpus(self, ents, pths, gidx, sr, bucket, want_i16, n_rows,
                    rep, load):
        """Stream the group's audio through the on-device front-end in
        64-row chunks: fill (threaded C++/Python decode) -> upload -> mel,
        then the chunk's host and device audio buffers are dropped. Peak
        host RAM is ONE chunk of transport audio (not the whole corpus-
        shaped buffer — for a corpus whose mel fits the 1 GB device budget
        that buffer would be ~5 GB), and only the (n_rows, F, n_mels) f32
        mel survives. The mel program is the exact einsum front-end with
        its explicit precision pins, and the i16/f32 transports are
        bit-identical downstream (scaling folded into the DFT weights), so
        a chunk that can't take the native i16 path (decode race, odd
        flavor) falls back to f32 without affecting numerics.

        Returns (replicated mel (n_rows, F, M), ns (len(gidx),) int32,
        all_i16: whether every chunk actually took the i16 path)."""
        ms = self.ms
        _, buf_len = _front_end(ms, sr, bucket)
        ns_real = np.zeros((len(gidx),), np.int32)
        chunks = []
        all_i16 = bool(want_i16)
        for s in range(0, n_rows, 64):
            rows = gidx[s : s + 64]
            m = len(rows)
            buf = None
            if want_i16 and m:
                from ..data import native

                ib = np.zeros((64, buf_len), np.int16)
                ns, srs, status = native.fill_batch_i16(
                    [pths[i] for i in rows], ib[:m], ms.n_fft // 2,
                    n_threads=self._preload_threads(),
                )
                if (status == 0).all():
                    for j, i in enumerate(rows):
                        validate_filled_row(ms, pths[i], ns[j],
                                            ents[i][2], srs[j])
                    buf, cns, ckind = ib, ns.astype(np.int32), "i16"
            if buf is None:
                buf = np.zeros((64, buf_len), np.float32)
                ckind = "f32"
                all_i16 = False
                cns = np.zeros((m,), np.int32)
                if m:
                    n_of_row = self._fill_rows_f32(
                        buf[:m], list(enumerate(rows)), ents, pths, load,
                        n_threads=self._preload_threads(),
                    )
                    cns = np.array([n_of_row[j] for j in range(m)], np.int32)
            ns_real[s : s + m] = cns
            nfull = np.zeros((64,), np.int32)
            nfull[:m] = cns  # pad rows: n=0 -> 1 valid frame, finite dB
            prog, consts = self._mel_prog(sr, bucket, ckind)
            chunks.append(prog(consts, jax.device_put(buf),
                               jnp.asarray(nfull)))
        mel = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)
        return rep(mel), ns_real, all_i16

    def _device_corpus(self, paths, entries, paths_ref, entries_ref, de, load):
        if self._audio_cache is None:  # gated on tr_ds_to_memory
            return {}
        key = (tuple(paths), tuple(paths_ref) if de else None)
        if key != self._dev_corpus_key:
            self._dev_corpus = self._build_device_corpus(
                paths, entries, paths_ref, entries_ref, de, load
            )
            self._dev_corpus_key = key
        return self._dev_corpus

    # -- one epoch -------------------------------------------------------------

    def run_epoch(self, ds, bias_losses, lr, rng_epoch, batch_size, shuffle=True, verbose=0):
        """Returns (mean_loss, y_train_hat (N, K))."""
        runner = self.runner
        ms = self.ms
        paths = ds.paths()
        paths_ref = ds.paths_ref()
        de = self.model.double_ended
        y_all = ds.targets()  # (N, K)
        K = y_all.shape[1]
        N = len(paths)

        order = np.arange(N)
        if shuffle:
            np.random.default_rng(int(rng_epoch[0]) & 0x7FFFFFFF).shuffle(order)

        entries = self._entries(paths)
        entries_ref = self._entries(paths_ref) if de else None
        engine_load = self._loader()
        dev_corpus = self._device_corpus(paths, entries, paths_ref, entries_ref,
                                         de, engine_load)
        # PARTIAL residency (corpus mels > tr_device_cache_mb): stable-
        # partition the shuffled order so resident rows batch together and
        # tail rows batch together — otherwise EVERY batch would straddle
        # the partition and split into two half-size optimizer steps
        # (documented deviation: when the corpus exceeds the device budget,
        # batch COMPOSITION differs from the reference's plain shuffle —
        # each batch is still a uniformly-shuffled draw from its partition;
        # docs/PARITY_MAP.md). Fully-resident corpora are unaffected.
        if dev_corpus:
            covered = set()
            for dc_e in dev_corpus.values():
                covered.update(dc_e["local"])
            res = np.array([int(i) in covered for i in range(N)])
            if res.any() and not res.all():
                order = np.concatenate([order[res[order]], order[~res[order]]])

        y_hat_all = np.zeros((N, K), dtype=np.float32)
        step_i = 0
        # per-batch (group, loss, y_hat) with loss/y_hat left ON DEVICE: a
        # device->host fetch inside the batch loop would serialize host fill
        # with device work and degrade the relay link mid-epoch (rule 5,
        # docs/RELAY_NOTES.md) — everything is materialized once at epoch end
        results = []

        pbar = None
        if verbose == 2:
            from tqdm import tqdm

            pbar = tqdm(total=-(-N // batch_size), ascii=">=",
                        bar_format="{bar} {percentage:3.0f}%, {n_fmt}/{total_fmt}, {elapsed}<{remaining}{postfix}")

        for start in range(0, N, batch_size):
            idx = order[start : start + batch_size]
            # split mixed-sample-rate batches (rare); per sr group decide the
            # transport: raw int16 when every file is plain PCM16 mono (the
            # native C++ loader fills it), float otherwise. DE always floats.
            by_sr = {}
            for i in idx:
                by_sr.setdefault(entries[i][2], []).append(int(i))
            for sr, g in by_sr.items():
                dc = dev_corpus.get(sr)
                # partial residency: the (at most one, thanks to the
                # partition-ordered shuffle) batch holding both resident and
                # tail rows splits — resident rows gather on device, tail
                # rows host-fill
                if dc is not None and not all(i in dc["local"] for i in g):
                    subs = [s for s in ([i for i in g if i in dc["local"]],
                                        [i for i in g if i not in dc["local"]])
                            if s]
                else:
                    subs = [g]
                for gsub in subs:
                    use_dc = dc if (dc is not None and gsub[0] in dc["local"]) else None
                    if de:
                        kind = "f32"
                    else:
                        kind = ("i16" if all(entries[i][0] == "native" for i in gsub)
                                else "f32")
                    loss, y_hat = self._run_group(
                        gsub, paths, paths_ref, entries, entries_ref, engine_load,
                        y_all, bias_losses, lr,
                        jax.random.fold_in(rng_epoch, step_i), K, de, kind,
                        use_dc,
                    )
                    results.append((gsub, loss, y_hat))
                    step_i += 1
            if pbar is not None:
                # live loss display (reference parity: tqdm postfix), but one
                # batch BEHIND: fetching the just-dispatched step's loss would
                # block until it finishes and serialize host fill with device
                # work (rule 5, docs/RELAY_NOTES.md); the previous step has
                # already drained while this batch was being filled
                if len(results) > 1:
                    pbar.set_postfix(loss=float(results[-2][1]))
                pbar.update()

        if pbar is not None:
            pbar.close()
        total_loss = 0.0
        for g, loss, y_hat in results:
            y_hat_all[g] = np.asarray(y_hat)[: len(g)]
            total_loss += float(loss)
        return total_loss / max(len(results), 1), y_hat_all

    def _run_group(self, idx, paths, paths_ref, entries, entries_ref, load,
                   y_all, bias_losses, lr, rng, K, de, kind, dc=None):
        ms = self.ms
        runner = self.runner
        sr = entries[idx[0]][2]

        n_real = len(idx)
        # with a mesh, the batch axis must divide the device count: pad
        # ragged batches by repeating row 0 with NaN targets. Padding rows
        # are excluded from the loss (NaN mask) AND from BN batch statistics
        # (row_valid), so the step is numerically identical to the unpadded
        # batch (tests/test_train_bn_parity.py::test_padded_batch_matches_unpadded)
        B = n_real
        if self.mesh is not None:
            n_dev = self.mesh.size
            B = -(-n_real // n_dev) * n_dev

        def shard(a):
            return jax.device_put(a, self._data_sharding) if self._data_sharding is not None else a

        if dc is not None:
            # device-resident corpus: batch MEL rows gathered on device by a
            # (B,) index vector — no audio decode, no upload, no front-end
            # recompute. The corpus-wide bucket pads time; segment windowing
            # + masked BN make the result identical to the per-batch-bucket
            # path (tests/test_train_device_cache.py).
            kind, bucket = dc["kind"], dc["bucket"]
            step_fn, _ = self._step(K, sr, bucket, kind, de, gather=True)
            ids = np.array([dc["local"][int(i)] for i in idx], np.int32)
            if B > n_real:
                ids = np.concatenate([ids, np.repeat(ids[:1], B - n_real)])
            ns = dc["n"][ids]
            audio_args = [dc["mel"], shard(ids), shard(ns)]
            if de:
                audio_args += [dc["mel_ref"], shard(ids), shard(dc["n_ref"][ids])]
        else:
            audio_args = None

        def n_wins_of(n_samples):
            return ms.n_wins(ms.n_frames(n_samples, sr))

        def fill_f32(ents, pths):
            buf = np.zeros((B, buf_len), dtype=np.float32)
            items = [(j, int(idx[j] if j < n_real else idx[0])) for j in range(B)]
            n_of_row = self._fill_rows_f32(buf, items, ents, pths, load)
            n = np.array([n_of_row[j] for j in range(B)], np.int32)
            return buf, n

        def fill_i16(pths):
            from ..data import native

            buf = np.empty((B, buf_len), dtype=np.int16)
            n = np.empty((B,), dtype=np.int32)
            ns, srs, status = native.fill_batch_i16(
                [pths[i] for i in idx], buf[:n_real], ms.n_fft // 2,
                n_threads=max(1, int(runner.args.get("tr_num_workers") or 4)),
            )
            if (status != 0).any():
                return None  # rare race: fall back to the float path
            for j, i in enumerate(idx):
                validate_filled_row(ms, paths[i], ns[j], entries[i][2], srs[j])
            n[:n_real] = ns
            for j in range(n_real, B):
                buf[j] = buf[0]
                n[j] = n[0]
            return buf, n

        if audio_args is None:
            max_nw = max(n_wins_of(_n_of(entries[i])) for i in idx)
            if de:
                max_nw = max(max_nw, max(n_wins_of(_n_of(entries_ref[i])) for i in idx))
            bucket = ms.bucket_for(max_nw)
            step_fn, buf_len = self._step(K, sr, bucket, kind, de)

            filled = fill_i16(paths) if kind == "i16" else None
            if filled is None:
                kind = "f32"
                step_fn, buf_len = self._step(K, sr, bucket, "f32", de)
                filled = fill_f32(entries, paths)
            buf_d, n_d = filled
            audio_args = [shard(buf_d), shard(n_d)]
            if de:
                buf_r, n_r = fill_f32(entries_ref, paths_ref)
                audio_args += [shard(buf_r), shard(n_r)]

        y = y_all[idx]  # (n_real, K)
        bias_b = np.stack([bl.coeffs(idx) for bl in bias_losses], axis=1)  # (n_real, K, 4)
        if B > n_real:
            y = np.concatenate([y, np.full((B - n_real, y.shape[1]), np.nan, np.float32)])
            pad_b = np.zeros((B - n_real,) + bias_b.shape[1:], np.float32)
            pad_b[..., 1] = 1.0
            bias_b = np.concatenate([bias_b, pad_b])

        row_valid = np.arange(B) < n_real
        params, self.opt_state, bn_state, loss, y_hat = step_fn(
            runner.params, self.opt_state, runner.state,
            shard(jnp.asarray(y)), shard(jnp.asarray(bias_b)),
            shard(jnp.asarray(row_valid)), jnp.float32(lr), rng, *audio_args,
        )
        runner.params, runner.state = params, bn_state
        return loss, y_hat  # device arrays; fetched at epoch end (run_epoch)


# ---------------------------------------------------------------------------
# results CSV + checkpoint writer (parity with `_saveResults`,
# `/root/reference/nisqa/NISQA_model.py:1053-1111`)
# ---------------------------------------------------------------------------


class ResultsWriter:
    def __init__(self, runner, runname):
        self.runner = runner
        self.runname = runname
        self.hist = None

    def save(self, epoch, loss, ep_runtime, r, bias_b, opt_state, best,
             sched=None, stopper=None):
        runner = self.runner
        args = runner.args
        ckpt_mode = args.get("tr_checkpoint", "every_epoch")
        if ckpt_mode == "best_only":
            base = self.runname
        else:
            base = f"{self.runname}__ep_{epoch + 1:03d}"
        run_dir = os.path.join(args["output_dir"], self.runname)
        os.makedirs(run_dir, exist_ok=True)

        results = {
            "runname": self.runname,
            "epoch": f"{epoch + 1:05d}",
            "filename": base + ".tar",
            "loss": loss,
            "ep_runtime": f"{ep_runtime:0.2f}",
            **runner.runinfos,
            **r,
            **{k: v for k, v in args.items() if k != "now"},
        }
        results = {k: str(v) for k, v in results.items()}
        row = pd.DataFrame(results, index=[0])
        self.hist = row if self.hist is None else pd.concat([self.hist, row], ignore_index=True)
        self.hist.to_csv(os.path.join(run_dir, self.runname + "__results.csv"), index=False)

        if ckpt_mode == "every_epoch" or (ckpt_mode == "best_only" and best):
            loop_state = {}
            if sched is not None:
                loop_state["sched"] = sched.state_dict()
            if stopper is not None:
                loop_state["stopper"] = stopper.state_dict()
            save_train_state(
                os.path.join(run_dir, base), runner.model, runner.params, runner.state,
                opt_state, args, epoch, bias_b=bias_b, results=results,
                loop_state=loop_state or None,
            )
        elif ckpt_mode not in ("every_epoch", "best_only"):
            raise ValueError("selected tr_checkpoint option not available")


# ---------------------------------------------------------------------------
# MOS training
# ---------------------------------------------------------------------------


def _maybe_resume(runner, engine, bias_losses, sched=None, stopper=None):
    """Full train-state resume from a native checkpoint (``tr_resume`` arg) —
    params, BN stats, optimizer moments, bias-loss coefficients, epoch, plus
    the LR-plateau scheduler and early-stopper trackers. The reference can
    only warm-start weights (SURVEY.md §5)."""
    base = runner.args.get("tr_resume")
    if not base:
        return 0
    for suffix in (".tar", ".msgpack"):
        if base.endswith(suffix):
            base = base[: -len(suffix)]
    from .checkpoint import load_train_state

    if len(bias_losses) > 1:
        bias_template = np.stack([bl.b for bl in bias_losses], axis=1)
    else:
        bias_template = bias_losses[0].b
    template = {
        "params": runner.params,
        "bn_state": runner.state,
        "opt_state": engine.opt_state,
        "bias_b": bias_template,
    }
    restored = load_train_state(base, template)
    runner.params = restored["params"]
    runner.state = restored["bn_state"]
    engine.opt_state = restored["opt_state"]
    bias_b = np.asarray(restored["bias_b"])
    if bias_b.size:
        if len(bias_losses) > 1:
            for k, bl in enumerate(bias_losses):
                bl.b = bias_b[:, k].copy()
        else:
            bias_losses[0].b = bias_b.copy()
    loop_state = restored["meta"].get("loop_state") or {}
    if sched is not None and "sched" in loop_state:
        sched.load_state_dict(loop_state["sched"])
    if stopper is not None and "stopper" in loop_state:
        stopper.load_state_dict(loop_state["stopper"])
    start = int(restored["meta"].get("epoch", 0))
    print(f"--> resumed from {base} at epoch {start}")
    return start


def _bias_losses(runner, k):
    args = runner.args
    return [
        BiasLoss(
            runner.ds_train.df.db,
            anchor_db=args.get("tr_bias_anchor_db"),
            mapping=args.get("tr_bias_mapping"),
            min_r=args.get("tr_bias_min_r"),
            do_print=(args.get("tr_verbose", 0) > 0),
        )
        for _ in range(k)
    ]


def train_mos(runner):
    args = runner.args
    runname = runner._make_runname_and_write_yaml()
    engine = TrainEngine(runner)
    sched = ReduceLROnPlateau(args["tr_lr"], args["tr_lr_patience"])
    stopper = EarlyStopper(args["tr_early_stop"])
    bias_losses = _bias_losses(runner, 1)
    writer = ResultsWriter(runner, runname)
    verbose = args.get("tr_verbose", 0)
    rng = jax.random.PRNGKey(int(args.get("seed", 0)))
    start_epoch = _maybe_resume(runner, engine, bias_losses, sched, stopper)

    print("--> start training")
    for epoch in range(start_epoch, args["tr_epochs"]):
        tic = time.time()
        rng, rng_ep = jax.random.split(rng)
        loss, y_hat = engine.run_epoch(
            runner.ds_train, bias_losses, sched.lr, rng_ep, args["tr_bs"], verbose=verbose
        )
        y_train = runner.ds_train.df[args["csv_mos_train"]].to_numpy().reshape(-1)
        bias_losses[0].update_bias(y_train, y_hat[:, 0])

        if verbose > 0:
            print("\n<---- Training ---->")
        runner.ds_train.df["mos_pred"] = y_hat[:, 0]
        _, r_train = eval_results(
            runner.ds_train.df, dcon=runner.ds_train.df_con,
            target_mos=args["csv_mos_train"], target_ci=args["csv_mos_train"] + "_ci",
            pred="mos_pred", mapping="first_order", do_print=(verbose > 0),
        )

        if verbose > 0:
            print("<---- Validation ---->")
        val_engine = runner._engine()
        y_val_hat = val_engine.predict_paths(runner.ds_val.paths(), runner.ds_val.paths_ref())
        runner.ds_val.write_predictions(y_val_hat)
        db_results, r_val = eval_results(
            runner.ds_val.df, dcon=runner.ds_val.df_con,
            target_mos=args["csv_mos_val"], target_ci=args["csv_mos_val"] + "_ci",
            pred="mos_pred", mapping="first_order", do_print=(verbose > 0),
        )

        r = {
            "train_r_p_mean_file": r_train["r_p_mean_file"],
            "train_rmse_map_mean_file": r_train["rmse_map_mean_file"],
            **r_val,
        }
        lr_now = sched.lr
        sched.step(loss)
        stop = stopper.step(r)
        ep_runtime = time.time() - tic
        print(
            f"ep {epoch + 1} sec {ep_runtime:0.0f} es {stopper.cnt} lr {lr_now:0.0e} "
            f"loss {loss:0.4f} // r_p_tr {r['train_r_p_mean_file']:0.2f} "
            f"rmse_map_tr {r['train_rmse_map_mean_file']:0.2f} // "
            f"r_p {r['r_p_mean_file']:0.2f} rmse_map {r['rmse_map_mean_file']:0.2f} // "
            f"best_r_p {stopper.best_r_p:0.2f} best_rmse_map {stopper.best_rmse:0.2f}"
        )
        writer.save(epoch, loss, ep_runtime, r, bias_losses[0].b, engine.opt_state,
                    stopper.best, sched=sched, stopper=stopper)
        if stop:
            print(f"--> Early stopping. best_r_p {stopper.best_r_p:0.2f} best_rmse {stopper.best_rmse:0.2f}")
            return
    print(f"--> Training done. best_r_p {stopper.best_r_p:0.2f} best_rmse_map {stopper.best_rmse:0.2f}")


# ---------------------------------------------------------------------------
# Multidimensional training
# ---------------------------------------------------------------------------

_DIM = ("mos", "noi", "dis", "col", "loud")


def train_dim(runner):
    args = runner.args
    runname = runner._make_runname_and_write_yaml()
    engine = TrainEngine(runner)
    sched = ReduceLROnPlateau(args["tr_lr"], args["tr_lr_patience"])
    stopper = EarlyStopperDim(args["tr_early_stop"])
    bias_losses = _bias_losses(runner, 5)
    writer = ResultsWriter(runner, runname)
    verbose = args.get("tr_verbose", 0)
    rng = jax.random.PRNGKey(int(args.get("seed", 0)))
    start_epoch = _maybe_resume(runner, engine, bias_losses, sched, stopper)

    print("--> start training")
    for epoch in range(start_epoch, args["tr_epochs"]):
        tic = time.time()
        rng, rng_ep = jax.random.split(rng)
        loss, y_hat = engine.run_epoch(
            runner.ds_train, bias_losses, sched.lr, rng_ep, args["tr_bs"], verbose=verbose
        )
        y_train = runner.ds_train.targets()
        for k in range(5):
            bias_losses[k].update_bias(y_train[:, k], y_hat[:, k])

        if verbose > 0:
            print("\n<---- Training ---->")
        runner.ds_train.write_predictions(y_hat)
        r_train = {}
        for t in _DIM:
            if verbose > 0:
                print(f"--> {t.upper()}:")
            _, rt = eval_results(
                runner.ds_train.df, dcon=runner.ds_train.df_con, target_mos=t,
                target_ci=f"{t}_ci", pred=f"{t}_pred", mapping="first_order",
                do_print=(verbose > 0),
            )
            suffix = "" if t == "mos" else f"_{t}"
            r_train[f"train_r_p_mean_file{suffix}"] = rt["r_p_mean_file"]
            r_train[f"train_rmse_map_mean_file{suffix}"] = rt["rmse_map_mean_file"]

        if verbose > 0:
            print("<---- Validation ---->")
        val_engine = runner._engine()
        y_val_hat = val_engine.predict_paths(runner.ds_val.paths(), runner.ds_val.paths_ref())
        runner.ds_val.write_predictions(y_val_hat)
        r_val, db_results = {}, {}
        for t in _DIM:
            if verbose > 0:
                print(f"--> {t.upper()}:")
            db_t, rv = eval_results(
                runner.ds_val.df, dcon=runner.ds_val.df_con, target_mos=t,
                target_ci=f"{t}_ci", pred=f"{t}_pred", mapping="first_order",
                do_print=(verbose > 0),
            )
            suffix = "" if t == "mos" else f"_{t}"
            r_val.update({f"{k}{suffix}": v for k, v in rv.items()})
            db_results[f"db_results_val_{t}"] = db_t

        r = {**r_train, **r_val}
        lr_now = sched.lr
        sched.step(loss)
        stop = stopper.step(r)
        ep_runtime = time.time() - tic
        r_dim_mean = np.mean([r[f"r_p_mean_file{'' if t == 'mos' else '_' + t}"] for t in _DIM])
        print(
            f"ep {epoch + 1} sec {ep_runtime:0.0f} es {stopper.cnt} lr {lr_now:0.0e} "
            f"loss {loss:0.4f} // r_p_tr {r['train_r_p_mean_file']:0.2f} "
            f"rmse_map_tr {r['train_rmse_map_mean_file']:0.2f} // "
            f"r_dim_mos_mean {r_dim_mean:0.2f}, r_p {r['r_p_mean_file']:0.2f} "
            f"rmse_map {r['rmse_map_mean_file']:0.2f} // "
            f"best_r_p {stopper.best_r_p_mos:0.2f} best_rmse_map {stopper.best_rmse_mos:0.2f}"
        )
        writer.save(
            epoch, loss, ep_runtime, r,
            np.stack([bl.b for bl in bias_losses], axis=1), engine.opt_state, stopper.best,
            sched=sched, stopper=stopper,
        )
        if stop:
            print(f"--> Early stopping. best_r_p {stopper.best_r_p_mos:0.2f} best_rmse {stopper.best_rmse_mos:0.2f}")
            return
    print(f"--> Training done. best_r_p {stopper.best_r_p_mos:0.2f} best_rmse {stopper.best_rmse_mos:0.2f}")
