"""Criteo CTR example: any ranking model, CSV or synthetic sample.

Usage (parity with reference ``examples/ranking/run_criteo.py``):
    python examples/ranking/run_criteo.py --model_name deepfm --epoch 2 [--dataset_path criteo.csv]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from benchmarks.datasets import build_criteo_ranking_dataset
from benchmarks.models import build_ranking_model
from torch_rechub_tpu.trainers import CTRTrainer
from torch_rechub_tpu.utils.data import ArrayLoader

MODELS = {"widedeep": "WideDeep", "deepfm": "DeepFM", "dcn": "DCN", "dcn_v2": "DCNv2", "edcn": "EDCN", "afm": "AFM", "autoint": "AutoInt", "fibinet": "FiBiNet"}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", default="deepfm", choices=sorted(MODELS))
    parser.add_argument("--epoch", type=int, default=2)
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--weight_decay", type=float, default=1e-5)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--embed_dim", type=int, default=16)
    parser.add_argument("--seed", type=int, default=2022)
    parser.add_argument("--save_dir", default="./saved")
    args = parser.parse_args()

    bundle = build_criteo_ranking_dataset(seed=args.seed, embed_dim=args.embed_dim)
    model = build_ranking_model(MODELS[args.model_name], bundle)
    trainer = CTRTrainer(
        model,
        optimizer_params={"lr": args.learning_rate, "weight_decay": args.weight_decay},
        n_epoch=args.epoch,
        model_path=args.save_dir,
        seed=args.seed,
    )
    train_dl = ArrayLoader(bundle.x_train, bundle.y_train, batch_size=args.batch_size, shuffle=True, seed=args.seed)
    test_dl = ArrayLoader(bundle.x_test, bundle.y_test, batch_size=args.batch_size)
    trainer.fit(train_dl, test_dl)
    auc = trainer.evaluate(model, test_dl)
    print(f"test auc: {auc:.4f}")


if __name__ == "__main__":
    main()
