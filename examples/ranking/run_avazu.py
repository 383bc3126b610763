"""Avazu CTR example — incl. the field-aware family (DeepFFM / FAT-DeepFFM).

Parity with reference ``examples/ranking/run_avazu.py``: dense features are
min-max scaled AND discretized into sparse twins; DeepFFM's linear features
use 1-dim embeddings and its cross features declare ``vocab * num_fields``
rows for the id-offset trick.  Real CSV via ``--dataset_path`` (columns
``f0..f23`` + ``label``) or a schema-identical synthetic sample.

    python examples/ranking/run_avazu.py --model_name deepffm
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from benchmarks.datasets import build_avazu_ranking_dataset
from benchmarks.models import build_ranking_model
from torch_rechub_tpu.basic.features import SparseFeature
from torch_rechub_tpu.models.ranking import DeepFFM, FatDeepFFM
from torch_rechub_tpu.trainers import CTRTrainer
from torch_rechub_tpu.utils.data import ArrayLoader

MODELS = {"widedeep": "WideDeep", "deepfm": "DeepFM", "dcn": "DCN", "deepffm": None, "fat_deepffm": None}


def build_model(name, bundle, embed_dim):
    if name in ("deepffm", "fat_deepffm"):
        sparse = [f for f in bundle.features if isinstance(f, SparseFeature)]
        linear = tuple(SparseFeature(f.name, vocab_size=f.vocab_size, embed_dim=1) for f in sparse)
        cross = tuple(SparseFeature(f.name, vocab_size=f.vocab_size * len(sparse), embed_dim=10) for f in sparse)
        mlp = {"dims": (256, 128), "dropout": 0.2, "activation": "relu"}
        if name == "deepffm":
            return DeepFFM(linear_features=linear, cross_features=cross, embed_dim=10, mlp_params=mlp)
        return FatDeepFFM(linear_features=linear, cross_features=cross, embed_dim=10, reduction_ratio=1, mlp_params=mlp)
    return build_ranking_model(MODELS[name], bundle)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", default="deepfm", choices=sorted(MODELS))
    parser.add_argument("--epoch", type=int, default=2)
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--embed_dim", type=int, default=16)
    parser.add_argument("--seed", type=int, default=2022)
    parser.add_argument("--save_dir", default="./saved")
    parser.add_argument("--dataset_path", default=None)
    args = parser.parse_args()

    bundle = build_avazu_ranking_dataset(seed=args.seed, embed_dim=args.embed_dim, dataset_path=args.dataset_path)
    model = build_model(args.model_name, bundle, args.embed_dim)
    trainer = CTRTrainer(model, optimizer_params={"lr": args.learning_rate}, n_epoch=args.epoch, model_path=args.save_dir, seed=args.seed)
    trainer.fit(
        ArrayLoader(bundle.x_train, bundle.y_train, batch_size=args.batch_size, shuffle=True, seed=args.seed),
        ArrayLoader(bundle.x_test, bundle.y_test, batch_size=args.batch_size),
    )
    print(f"test auc: {trainer.evaluate(model, ArrayLoader(bundle.x_test, bundle.y_test, batch_size=args.batch_size)):.4f}")


if __name__ == "__main__":
    main()
