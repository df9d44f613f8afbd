"""Measure the reference (PyTorch CPU) predict_dir throughput baseline.

librosa is not installed, so the reference front-end is stood in for by this
repo's numpy mel implementation (melspec_np) which matches it numerically
(<1e-3 dB) and is in the same CPU cost class. The rest is the reference's own
stack: torch Dataset -> DataLoader(bs=32, workers) -> NISQA_DIM forward on
CPU, eval mode — i.e. the `predict_dir` call stack of
`/root/reference/nisqa/NISQA_lib.py:1441-1467`.

Result goes to BASELINE.md and is the `vs_baseline` denominator in bench.py.

``--cached``: measure the reference's RAM-cached steady state instead — mel
specs precomputed once into memory (the reference's own `_to_memory`
preload, `NISQA_lib.py:2109-2127`, which its predict mode never uses but a
val-loop pass would), then repeated DataLoader passes doing only
segment_specs + padding + forward; best pass reported. This is the
strongest honest CPU denominator for the TPU engine's CACHED serving
number (VERDICT round 2, weak #3).
"""

import os
import sys
import time
import types

import numpy as np

sys.modules.setdefault("librosa", types.ModuleType("librosa"))
sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch  # noqa: E402
from torch.utils.data import DataLoader, Dataset  # noqa: E402

from nisqa import NISQA_lib as NL  # noqa: E402
from nisqa_tpu.audio.melspec import melspec_np  # noqa: E402
from nisqa_tpu.audio.wav import read_wav, write_wav  # noqa: E402
from nisqa_tpu.compat.model_args import model_args_from_ckpt_args  # noqa: E402


def make_corpus(out_dir, n_files=96, seed=0):
    # the EXACT corpus bench.py measures the TPU pipeline on, so the
    # vs_baseline ratio compares identical workloads
    from bench import make_corpus as _mk

    total_sec, paths = _mk(out_dir, n_files, seed)
    return paths, total_sec


class RefStyleDataset(Dataset):
    def __init__(self, paths, args, to_memory=False):
        self.paths = paths
        self.args = args
        # reference `_to_memory` semantics (`NISQA_lib.py:2109-2127`): the
        # MEL SPEC is cached; __getitem__ still runs segment_specs + pad
        self.mem = [None] * len(paths) if to_memory else None

    def __len__(self):
        return len(self.paths)

    def _spec(self, i):
        if self.mem is not None and self.mem[i] is not None:
            return self.mem[i]
        a = self.args
        y, sr = read_wav(self.paths[i])
        spec = melspec_np(
            y, sr, n_fft=a["ms_n_fft"], hop_s=a["ms_hop_length"],
            win_s=a["ms_win_length"], n_mels=a["ms_n_mels"], fmax=a["ms_fmax"],
        )
        if self.mem is not None:
            self.mem[i] = spec
        return spec

    def __getitem__(self, i):
        a = self.args
        x, n_wins = NL.segment_specs(
            self.paths[i], torch.from_numpy(self._spec(i)), a["ms_seg_length"],
            a["ms_seg_hop_length"], a["ms_max_segments"],
        )
        return x, np.array(n_wins)


def main():
    import tempfile

    ckpt = torch.load("/root/reference/weights/nisqa.tar", map_location="cpu", weights_only=False)
    args = dict(ckpt["args"])
    args["model"] = "NISQA_DIM"
    margs = model_args_from_ckpt_args(args)
    if isinstance(margs["cnn_kernel_size"], list):
        margs["cnn_kernel_size"] = tuple(margs["cnn_kernel_size"])
    model = NL.NISQA_DIM(**margs)
    model.load_state_dict(ckpt["model_state_dict"], strict=True)
    model.eval()

    tmp = tempfile.mkdtemp(prefix="nisqa_bench_ref_")
    argv = [a for a in sys.argv[1:] if a != "--cached"]
    cached = "--cached" in sys.argv
    n_files = int(argv[0]) if argv else 96
    workers = int(argv[1]) if len(argv) > 1 else 8
    paths, total_sec = make_corpus(tmp, n_files)
    ds = RefStyleDataset(paths, args, to_memory=cached)
    # cached mode: workers must be 0 — DataLoader worker processes would
    # each re-derive (and discard) the cache, which is also why the
    # reference pairs its _to_memory preload with num_workers=0 epochs
    dl = DataLoader(ds, batch_size=32, shuffle=False,
                    num_workers=0 if cached else workers)

    # warmup (one batch through the model)
    xb, nw = next(iter(DataLoader(ds, batch_size=2, num_workers=0)))
    with torch.no_grad():
        model(xb, nw)

    if cached:
        for i in range(len(ds)):  # preload specs into RAM (untimed)
            ds._spec(i)

    walls, out = [], None
    for _ in range(3 if cached else 1):
        tic = time.time()
        outs = []
        with torch.no_grad():
            for xb, nw in dl:
                outs.append(model(xb, nw).numpy())
        walls.append(time.time() - tic)
        out = np.concatenate(outs)
    wall = min(walls)
    mode = "CACHED mels (_to_memory steady state)" if cached else "cold"
    print(f"files={len(paths)} audio={total_sec:.1f}s wall={wall:.2f}s "
          f"throughput={total_sec / wall:.2f} audio-sec/sec "
          f"(workers={dl.num_workers}, {mode})")
    print("first preds:", out[:2, 0])


if __name__ == "__main__":
    main()
