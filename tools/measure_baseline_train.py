"""Measure the reference (PyTorch CPU) TRAINING-epoch throughput baseline.

Mirrors `_train_mos`'s hot loop (`/root/reference/nisqa/NISQA_model.py:
124-155`): DataLoader (decode + mel + segment per item, reference
`SpeechQualityDataset` semantics) -> NISQA forward -> MSE backward -> Adam
step, one epoch over the SAME 80-file corpus and full-size architecture
that tools/bench_train.py trains on TPU. librosa is stood in for by this
repo's numpy mel (same CPU cost class, <1e-3 dB parity).

Deliberately conservative vs the TPU number: this measures ONLY the batch
loop (no per-epoch train eval, no validation pass), while bench_train.py's
audio-s/s includes both — so the reported speedup understates the gap.

Prints one JSON line; the result goes to BASELINE.md.
"""

import json
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
from bench import CORPUS_DIR, make_corpus  # noqa: E402
from nisqa_tpu.audio.melspec import melspec_np  # noqa: E402
from nisqa_tpu.audio.wav import read_wav  # noqa: E402
from nisqa_tpu.compat.model_args import model_args_from_ckpt_args  # noqa: E402


class RefTrainDataset(Dataset):
    def __init__(self, paths, targets, args):
        self.paths = paths
        self.targets = targets
        self.args = args

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        a = self.args
        y, sr = read_wav(self.paths[i])
        spec = melspec_np(
            y, sr, n_fft=a["ms_n_fft"], hop_s=a["ms_hop_length"],
            win_s=a["ms_win_length"], n_mels=a["ms_n_mels"], fmax=a["ms_fmax"],
        )
        x, n_wins = NL.segment_specs(
            self.paths[i], torch.from_numpy(spec), a["ms_seg_length"],
            a["ms_seg_hop_length"], a["ms_max_segments"],
        )
        return x, np.array(n_wins), np.float32(self.targets[i])


def main():
    total_sec, paths = make_corpus(CORPUS_DIR)
    train_paths = paths[:80]
    rng = np.random.default_rng(0)
    targets = rng.uniform(1.0, 5.0, len(train_paths)).astype(np.float32)
    train_audio = sum(
        os.path.getsize(p) for p in train_paths
    ) / (2 * 48000)  # PCM16 mono 48 kHz

    ckpt = torch.load("/root/reference/weights/nisqa_mos_only.tar",
                      map_location="cpu", weights_only=False)
    args = dict(ckpt["args"])
    margs = model_args_from_ckpt_args(args)
    if isinstance(margs.get("cnn_kernel_size"), list):
        margs["cnn_kernel_size"] = tuple(margs["cnn_kernel_size"])
    model = NL.NISQA(**margs)  # trained from scratch, like bench_train.py
    model.train()

    workers = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    dl = DataLoader(RefTrainDataset(train_paths, targets, args),
                    batch_size=32, shuffle=True, num_workers=workers)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    crit = torch.nn.MSELoss()

    epoch_times = []
    for epoch in range(2):
        t0 = time.perf_counter()
        for xb, nb, yb in dl:
            yhat = model(xb.float(), nb)
            loss = crit(yhat.squeeze(-1), yb)
            opt.zero_grad()
            loss.backward()
            opt.step()
        epoch_times.append(time.perf_counter() - t0)
    best = min(epoch_times)
    print(json.dumps({
        "metric": "ref_cpu_train_epoch_throughput_nisqa_bs32",
        "value": round(train_audio / best, 2),
        "unit": "audio-sec/sec",
        "epoch_sec_best": round(best, 2),
        "epochs": epoch_times,
        "workers": workers,
    }))


if __name__ == "__main__":
    main()
