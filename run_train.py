"""Training CLI — YAML-driven like the reference ``run_train.py``
(`/root/reference/run_train.py:12-25`). Argparse values override YAML keys.

Example:
  python run_train.py --yaml config/train_nisqa_cnn_sa_ap.yaml
"""

import argparse

import yaml

from nisqa_tpu.model import NisqaTPU

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--yaml", required=True, type=str, help="YAML file with config")
    cli = vars(parser.parse_args())

    with open(cli["yaml"]) as f:
        # FullLoader: configs may use the `!!python/tuple` tag for
        # cnn_kernel_size like the reference configs do
        args_yaml = yaml.load(f, Loader=yaml.FullLoader)
    args = {**args_yaml, **cli}

    nisqa = NisqaTPU(args)
    nisqa.train()
