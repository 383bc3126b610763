"""Ali-CCP CTR ranking example (label = click).

Parity with reference ``examples/ranking/run_ali_ccp_ctr_ranking.py``:
dense columns are the D*-named ones, everything else (minus click/purchase)
is sparse.  Real CSV via ``--dataset_path`` or a schema-identical sample.

    python examples/ranking/run_ali_ccp_ctr_ranking.py --model_name widedeep
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from benchmarks.datasets import build_aliccp_ctr_dataset
from benchmarks.models import build_ranking_model
from torch_rechub_tpu.trainers import CTRTrainer
from torch_rechub_tpu.utils.data import ArrayLoader

MODELS = {"widedeep": "WideDeep", "deepfm": "DeepFM", "dcn": "DCN"}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_name", default="widedeep", choices=sorted(MODELS))
    parser.add_argument("--epoch", type=int, default=2)
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--embed_dim", type=int, default=16)
    parser.add_argument("--seed", type=int, default=2022)
    parser.add_argument("--save_dir", default="./saved")
    parser.add_argument("--dataset_path", default=None)
    args = parser.parse_args()

    bundle = build_aliccp_ctr_dataset(seed=args.seed, embed_dim=args.embed_dim, dataset_path=args.dataset_path)
    model = build_ranking_model(MODELS[args.model_name], bundle)
    trainer = CTRTrainer(model, optimizer_params={"lr": args.learning_rate}, n_epoch=args.epoch, model_path=args.save_dir, seed=args.seed)
    test_dl = ArrayLoader(bundle.x_test, bundle.y_test, batch_size=args.batch_size)
    trainer.fit(ArrayLoader(bundle.x_train, bundle.y_train, batch_size=args.batch_size, shuffle=True, seed=args.seed), test_dl)
    print(f"test auc: {trainer.evaluate(model, test_dl):.4f}")


if __name__ == "__main__":
    main()
