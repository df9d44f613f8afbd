"""Headline benchmark: predict_dir throughput (audio-seconds/sec/chip).

Synthetic 48 kHz corpus (96 files, 3-30 s log-uniform — a speech-corpus-like
length spread incl. clips beyond 12 s that hit the larger buckets) through
the full TPU pipeline — wav decode on host, mel + segmentation + NISQA_DIM
(released nisqa.tar weights) on device, bs=32 — the same call stack a user
hits via ``run_predict.py --mode predict_dir`` (BASELINE.json headline
metric). Repeat passes exercise the device-resident corpus cache, i.e. the
serving steady state (the reference's analog is its `_to_memory` RAM
preload, `NISQA_lib.py:2109-2127`).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline divides by the PyTorch reference on this host's CPU (torch-cpu
eval-mode NISQA_DIM + numpy mel front-end standing in for librosa, best
measured config: DataLoader workers=0 on this 1-core box) measured by
tools/measure_baseline.py on the SAME corpus — see BASELINE.md.

A/B env switches: NISQA_BENCH_NOFUSE=1 (never fuse; default = cached passes
run as ONE fused executable over the resident mel blocks — NISQA_BENCH_FUSE
is kept as an alias of the default since round 4 removed the legacy
flat-audio fused regime),
NISQA_BENCH_PALLAS=1 / NISQA_BENCH_NOPALLAS=1 (force the Pallas DFT->mel
front-end on/off; default auto = on for TPU backends),
NISQA_BENCH_NOCACHE=1 (disable the corpus cache; every pass cold),
NISQA_BENCH_CACHE_MB=N (pin the cache cap below the corpus to measure the
PARTIAL-cache regime at a controlled resident fraction — scaling table in
BASELINE.md round 4), NISQA_BENCH_ASYNC_DEPTH=N (pipelining lookahead,
default 8), NISQA_BENCH_ASYNC_SWEEP=2,4,8 (same-session depth curve),
NISQA_BENCH_DEVRATE=1 (fetch-free cached passes: block_until_ready but no
device->host readback — isolates the DEVICE-side rate from the relay's
~163 ms end-of-pass fetch; the number direct-attached hardware would see),
NISQA_BENCH_ASYNC=1 (measure ONLY the pipelined steady state; see below),
NISQA_BENCH_STAGES=1 (print each pass's per-stage breakdown to stderr).

The DEFAULT run measures THREE regimes over the same engine/corpus in one
session (so the rates are directly comparable under the same pool
conditions) and reports the pipelined serving steady state as the headline
value: cached passes dispatched with fetch="async" in blocks of 4, every
handle resolved and every block's outputs validated, so each pass's
device->host readback RPC rides behind the next passes' device execution —
the rate a streaming serving loop sustains. Alongside it ship the plain
synchronous per-pass rate (best of 7 fetched passes — round 1/2's headline
definition) as "fetched_best_pass" with regime-matched "fetched_vs_*"
ratios, and the fetch-free device rate (best of 3 cached block-only
passes) as "devrate_best_pass".

Round 5 additions: per-regime variance fields (*_median, *_n — the shared
pool adds ~3x pass variance, so medians make cross-round deltas readable),
and FLOPs/MFU grounding (flops_per_audio_s, tflops_sustained, mfu_pct):
tools/flops.py counts the cached pass's executed FLOPs (padding included)
with XLA's own cost model on a forced-CPU subprocess, and the headline rate
converts to sustained TFLOP/s against the v5e bf16 peak (197 TFLOPS). The
model's matmul shapes (48x15 convs at <=64 channels, d=64 attention)
underfill the MXU by design, so ~10-15% MFU is the architectural ceiling —
see BASELINE.md round 5.
"""

import json
import os
import sys
import time

import numpy as np

# tools/measure_baseline.py: the reference's BEST measured rate across
# corpus sizes/configs (96 files, workers=0). Deliberately kept as the
# denominator for every corpus size — the matched 384-file CPU measurement
# is lower (29.0 a-s/s), so vs_baseline understates the large-corpus gap.
CPU_BASELINE_AUDIO_SEC_PER_SEC = 37.8
# the STRONGEST honest denominator (VERDICT-r2 weak #3): the reference with
# RAM-cached mels (its own `_to_memory`, wired into the predict stack by
# tools/measure_baseline.py --cached), 384 files, best of 3 — the CPU analog
# of the TPU engine's cached serving steady state.
CPU_CACHED_BASELINE_AUDIO_SEC_PER_SEC = 65.3
# default corpus: 384 files ≈ 4,500 audio-s — closer to real NISQA serving
# corpora (the NISQA Corpus is 14k files) and big enough to amortise the
# per-pass RPC floor. NISQA_BENCH_FILES overrides (96 = the round-1 corpus;
# 7168+ = the NISQA-Corpus-scale regime, BASELINE.md round 5).
N_FILES = int(os.environ.get("NISQA_BENCH_FILES") or 384)
# TPU v5e (v5 lite) bf16 peak, dense: 197 TFLOP/s/chip (public spec). The
# cached serving pass runs the model at default precision (bf16-pass
# matmuls), so this is the MFU denominator; override for other chips via
# NISQA_BENCH_PEAK_TFLOPS.
PEAK_TFLOPS = float(os.environ.get("NISQA_BENCH_PEAK_TFLOPS") or 197.0)


def corpus_dir(n_files):
    """Canonical bench-corpus location — shared with tools/bench_train.py
    so both benches measure the SAME corpus for a given size."""
    return ("/tmp/nisqa_bench_corpus_v2" if n_files == 96
            else f"/tmp/nisqa_bench_corpus_v2_{n_files}")


CORPUS_DIR = corpus_dir(N_FILES)


def make_corpus(out_dir, n_files=N_FILES, seed=0):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from nisqa_tpu.audio.wav import write_wav

    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    total = 0.0
    paths = []
    for i in range(n_files):
        p = os.path.join(out_dir, f"bench_{i:03d}.wav")
        sr = 48000
        dur = float(np.exp(rng.uniform(np.log(3.0), np.log(30.0))))
        n = int(sr * dur)
        if not os.path.exists(p):
            t = np.arange(n) / sr
            f0 = rng.uniform(100, 300)
            y = (
                0.3 * np.sin(2 * np.pi * f0 * t)
                + 0.1 * np.sin(2 * np.pi * 3.1 * f0 * t)
                + 0.05 * rng.standard_normal(n)
            )
            write_wav(p, y.astype(np.float32), sr)
        paths.append(p)
        total += n / sr
    return total, paths


def _run(warm_only=False):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from nisqa_tpu.compat.torch_ckpt import load_model_from_tar
    from nisqa_tpu.data.pipeline import InferenceEngine, MsConfig

    total_audio_sec, _ = make_corpus(CORPUS_DIR)
    paths = sorted(
        os.path.join(CORPUS_DIR, f) for f in os.listdir(CORPUS_DIR) if f.endswith(".wav")
    )

    model, params, state, args = load_model_from_tar("/root/reference/weights/nisqa.tar")
    engine = InferenceEngine(
        model, params, state, MsConfig(args), batch_size=32, num_workers=8,
        # default None: interleaved cold pass, cached passes upgrade to one
        # fused executable (FUSE is an alias); NOFUSE disables fusing
        fuse_pass=(True if os.environ.get("NISQA_BENCH_FUSE")
                   else False if os.environ.get("NISQA_BENCH_NOFUSE") else None),
        # default None = auto (Pallas front-end on TPU backends); A/B overrides
        pallas_mel=(False if os.environ.get("NISQA_BENCH_NOPALLAS")
                    else True if os.environ.get("NISQA_BENCH_PALLAS") else None),
        # corpus residency must fit or every pass is cold: scale the cap
        # with the corpus (512 MB covers the default 96 files; ~6 MB/file
        # of padded i16 at 3-30 s / 48 kHz). NISQA_BENCH_CACHE_MB pins an
        # explicit cap — used to measure the PARTIAL-cache regime (corpus
        # bigger than the cap, the NISQA-Corpus-at-14k-files shape) at a
        # controlled resident fraction.
        cache_mb=(0 if os.environ.get("NISQA_BENCH_NOCACHE")
                  else float(os.environ["NISQA_BENCH_CACHE_MB"])
                  if os.environ.get("NISQA_BENCH_CACHE_MB")
                  else max(512, N_FILES * 6)),
        # NISQA_BENCH_FE=exact|fast A/B override; default None = engine
        # auto ('fast' at default precision — parity bound in BASELINE.md)
        fe_precision=os.environ.get("NISQA_BENCH_FE") or None,
    )

    # warmup compiles (persistent-cache-backed) + executes, no result fetch
    engine.warmup(paths)
    if warm_only:
        return None, None

    # several passes: the shared TPU pool behind the relay adds ~3x pass
    # variance (docs/RELAY_NOTES.md); report the best (steady-state) pass.
    # Pass 1 is cold (decode + upload); passes 2+ run from the device-
    # resident corpus cache — the serving steady state.
    devrate = bool(os.environ.get("NISQA_BENCH_DEVRATE"))
    stages = bool(os.environ.get("NISQA_BENCH_STAGES"))

    # pipelining depth: passes dispatched per block before any handle
    # resolves. Default 8 — the measured knee of the same-session depth
    # curve (BASELINE.md round 4); NISQA_BENCH_ASYNC_DEPTH overrides.
    default_depth = int(os.environ.get("NISQA_BENCH_ASYNC_DEPTH") or 8)

    def async_blocks(n_blocks=3, depth=None):
        # pipelined steady state: blocks of `depth` overlapped CACHED
        # passes — all dispatched before any handle is resolved, so each
        # pass's readback RPC rides behind the next passes' device
        # execution. Every handle is resolved and every output validated
        # (the assert runs inside the loop so EVERY block's outputs are
        # checked). Returns the per-pass wall of EVERY block (best is the
        # headline; median/n ship as variance fields — VERDICT-r4 next #7).
        depth = depth or default_depth
        walls = []
        for b in range(n_blocks):
            tic = time.time()
            handles = [engine.predict_paths(paths, fetch="async")
                       for _ in range(depth)]
            ys = [h() for h in handles]
            walls.append((time.time() - tic) / depth)
            assert all(np.isfinite(yy).all() for yy in ys)
            if stages:
                print(f"async block {b}: {engine.stats['last']}",
                      file=sys.stderr)
        return walls

    if os.environ.get("NISQA_BENCH_ASYNC_SWEEP"):
        # same-session pipelining-depth curve: one cold pass, then the
        # async steady state at each depth in turn (comma-separated list)
        y = engine.predict_paths(paths)
        assert np.isfinite(y).all()
        sweep = {}
        for d in os.environ["NISQA_BENCH_ASYNC_SWEEP"].split(","):
            sweep[f"async_d{d}"] = min(async_blocks(depth=int(d)))
        return total_audio_sec, sweep
    if os.environ.get("NISQA_BENCH_ASYNC"):
        # A/B mode: ONLY the pipelined steady state (pass 1 cold fetched to
        # populate the device-resident cache)
        y = engine.predict_paths(paths)
        assert np.isfinite(y).all()
        return total_audio_sec, {"async_walls": async_blocks()}
    runs, y = [], None
    for i in range(7):
        # devrate mode: pass 1 populates the device cache (fetched as usual);
        # passes 2+ execute fetch-free (block_until_ready only) — the
        # VERDICT-r2 ask to pin the device-side compute bound
        fetch = not (devrate and i > 0)
        tic = time.time()
        out = engine.predict_paths(paths, fetch=fetch)
        runs.append(time.time() - tic)
        if fetch:
            y = out
        if stages:
            print(f"pass {i}: {engine.stats['last']}", file=sys.stderr)
    assert np.isfinite(y).all()
    if devrate:
        return total_audio_sec, {"devrate_walls": runs[1:]}
    # pass 0 is the cold pass; cached-pass variance is over passes 1+ (the
    # best includes pass 0 only if it somehow won, which it never does)
    walls = {"fetched_walls": runs, "cold_wall": runs[0]}
    # default run: measure the OTHER two regimes in the SAME session so the
    # three rates are directly comparable (same pool conditions) — the
    # fetch-free device rate (3 cached passes, block_until_ready only) and
    # the pipelined serving steady state (the headline; module docstring).
    dev_runs = []
    for _ in range(3):
        tic = time.time()
        engine.predict_paths(paths, fetch=False)
        dev_runs.append(time.time() - tic)
    walls["devrate_walls"] = dev_runs
    walls["async_walls"] = async_blocks()
    return total_audio_sec, walls


def _wait_for_backend(budget_s):
    """The shared TPU pool goes fully unavailable for stretches (backend
    init then HANGS rather than erroring). Probe it in bounded throwaway
    subprocesses so this process neither hangs nor taints its own backend;
    give up after ``budget_s`` with a clear error instead of hanging the
    caller forever."""
    import subprocess

    deadline = time.time() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, text=True, timeout=240,
            )
            if probe.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            print(f"error: TPU backend unavailable after {attempt} probes "
                  f"over {budget_s} s; not starting the measurement.",
                  file=sys.stderr)
            sys.exit(3)
        print(f"TPU backend unavailable (probe {attempt}); retrying...",
              file=sys.stderr)
        time.sleep(min(120, max(1, deadline - time.time())))


def main():
    import subprocess

    _wait_for_backend(int(os.environ.get("NISQA_BENCH_WAIT_S") or 1800))

    # Cold-cache XLA compiles go through the relay's remote-compile channel,
    # which leaves that process's host link degraded (docs/RELAY_NOTES.md).
    # Populate the persistent compilation cache in a throwaway subprocess so
    # the measuring process only ever loads from disk. A transient priming
    # failure (e.g. the shared TPU pool dropping out mid-compile) is
    # reported but NOT fatal: the measuring run below retries the compiles
    # itself — a degraded-link number beats no number.
    try:
        prime = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--warm-cache-only"],
            capture_output=True, text=True,
            timeout=int(os.environ.get("NISQA_BENCH_PRIME_TIMEOUT_S") or 5400),
        )
        rc, err = prime.returncode, prime.stderr
    except subprocess.TimeoutExpired as e:
        rc, err = -1, (e.stderr.decode(errors="replace")[-2000:]
                       if e.stderr else "priming timed out")
    if rc != 0:
        print("warning: cache-priming subprocess failed "
              f"(exit {rc}); measuring anyway.\n"
              f"{(err or '')[-2000:]}", file=sys.stderr)

    total_audio_sec, walls = _run()

    metric = "predict_dir_throughput_nisqa_dim_bs32"
    sweep_keys = [k for k in walls if k.startswith("async_d")]
    if sweep_keys:
        # depth-sweep mode: one record with the whole same-session curve
        print(json.dumps({
            "metric": metric + "_async_depth_sweep",
            "unit": "audio-sec/sec/chip",
            **{k: round(total_audio_sec / walls[k], 2) for k in sweep_keys},
        }))
        return

    def rate(wall):
        return round(total_audio_sec / wall, 2)

    def variance(prefix, wl):
        # best/median/n per regime (VERDICT-r4 next #7): separates
        # round-over-round deltas from the ~3x shared-pool pass variance
        # without BASELINE.md archaeology. Rates, not walls, so fields are
        # directly comparable to the headline.
        return {
            f"{prefix}_best_pass": rate(min(wl)),
            f"{prefix}_median": rate(float(np.median(wl))),
            f"{prefix}_n": len(wl),
        }

    if "async_walls" in walls:
        # default run: all three regimes from ONE session. Headline stays
        # the pipelined serving steady state (round-3 definition); the
        # per-regime rates + ratios ship alongside so no cross-round or
        # cross-regime comparison has to mix denominator regimes.
        metric += "_async_pipelined"
        value = total_audio_sec / min(walls["async_walls"])
    elif "devrate_walls" in walls:
        metric += "_devrate_nofetch"
        value = total_audio_sec / min(walls["devrate_walls"])
    else:
        value = total_audio_sec / min(walls["fetched_walls"])
    record = {
        "metric": metric,
        "value": round(value, 2),
        "unit": "audio-sec/sec/chip",
        # NOTE: vs_* divide the HEADLINE (pipelined, in the default run) by
        # synchronous CPU rates; regime-matched ratios for rounds 1/2's
        # synchronous definition are the fetched_* fields below.
        "vs_baseline": round(value / CPU_BASELINE_AUDIO_SEC_PER_SEC, 2),
        # reference with RAM-cached mels (see BASELINE.md round 3)
        "vs_cached_cpu": round(value / CPU_CACHED_BASELINE_AUDIO_SEC_PER_SEC, 2),
        "n_files": N_FILES,
        "total_audio_s": round(total_audio_sec, 1),
    }
    if "async_walls" in walls:
        record.update(variance("async", walls["async_walls"]))
    if "fetched_walls" in walls and "async_walls" in walls:
        # rounds 1/2's headline definition (one synchronous fetched pass,
        # best of 7) with its own regime-matched ratios. Pass 0 is cold;
        # variance is over the cached passes.
        fetched = total_audio_sec / min(walls["fetched_walls"])
        record["fetched_best_pass"] = round(fetched, 2)
        record["fetched_vs_baseline"] = round(
            fetched / CPU_BASELINE_AUDIO_SEC_PER_SEC, 2)
        record["fetched_vs_cached_cpu"] = round(
            fetched / CPU_CACHED_BASELINE_AUDIO_SEC_PER_SEC, 2)
        record.update(variance("fetched_cached", walls["fetched_walls"][1:]))
        record["cold_pass_rate"] = rate(walls["cold_wall"])
    if "devrate_walls" in walls and "async_walls" in walls:
        # same-session fetch-free device rate: grounds the pipelined
        # headline (readback amortization) against the device-side bound
        record.update(variance("devrate", walls["devrate_walls"]))
    record.update(_mfu_fields(walls, total_audio_sec, value))
    print(json.dumps(record))


def _flops_record():
    """Per-pass FLOP counts from tools/flops.py (XLA cost model, forced-CPU
    subprocess), cached next to the corpus keyed by checkpoint identity —
    the CPU compiles run once per (corpus size, checkpoint)."""
    import subprocess

    tar = "/root/reference/weights/nisqa.tar"
    st = os.stat(tar)
    cache = os.path.join(CORPUS_DIR, f"flops_bs32_{st.st_size}_{st.st_mtime_ns}.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)
    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "flops.py")
    proc = subprocess.run(
        [sys.executable, tool, tar, CORPUS_DIR, "32"],
        capture_output=True, text=True, timeout=3600,
    )
    if proc.returncode != 0:
        print(f"warning: flops tool failed; no MFU fields.\n"
              f"{proc.stderr[-2000:]}", file=sys.stderr)
        return None
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    with open(cache, "w") as f:
        json.dump(rec, f)
    return rec


def _mfu_fields(walls, total_audio_sec, headline_rate):
    """MFU grounding (VERDICT-r4 next #3): the fetched/devrate/async regimes
    all execute the CACHED pass (segment+model; the front-end ran once on
    the cold pass), so one per-pass FLOP count converts each regime's wall
    into sustained TFLOP/s and an MFU vs the chip's bf16 peak."""
    try:
        fl = _flops_record()
    except Exception as e:  # never let grounding kill the measurement
        print(f"warning: flops counting raised {e!r}; no MFU fields.",
              file=sys.stderr)
        return {}
    if not fl:
        return {}
    f_pass = fl["cached_flops_per_pass"]
    out = {
        "flops_per_audio_s": round(f_pass / total_audio_sec, 1),
        "tflops_sustained": round(headline_rate / total_audio_sec
                                  * f_pass / 1e12, 3),
        "peak_tflops": PEAK_TFLOPS,
    }
    out["mfu_pct"] = round(out["tflops_sustained"] / PEAK_TFLOPS * 100, 2)
    if "devrate_walls" in walls:
        out["mfu_devrate_pct"] = round(
            f_pass / min(walls["devrate_walls"]) / 1e12 / PEAK_TFLOPS * 100, 2)
    return out


if __name__ == "__main__":
    if "--warm-cache-only" in sys.argv:
        _run(warm_only=True)
    else:
        main()
