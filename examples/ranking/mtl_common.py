"""Shared multi-task example plumbing (used by run_ali_ccp_multi_task,
run_aliexpress, run_census, run_metabalance, run_gradnorm)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from benchmarks.models import build_multitask_model
from torch_rechub_tpu.trainers import MTLTrainer
from torch_rechub_tpu.utils.data import ArrayLoader

MODELS = {"sharedbottom": "SharedBottom", "esmm": "ESMM", "mmoe": "MMOE", "ple": "PLE", "aitm": "AITM"}


def add_mtl_args(parser, default_model="mmoe"):
    parser.add_argument("--model_name", default=default_model, choices=sorted(MODELS))
    parser.add_argument("--adaptive", default=None, choices=[None, "uwl", "gradnorm", "metabalance"])
    parser.add_argument("--epoch", type=int, default=2)
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--seed", type=int, default=2022)
    parser.add_argument("--save_dir", default="./saved")
    parser.add_argument("--dataset_path", default=None, help="real CSV with the reference's column conventions")
    return parser


def fit_multitask(bundle, args):
    """Build model + trainer from a MultiTaskDatasetBundle, fit, return the log."""
    name = MODELS[args.model_name]
    model = build_multitask_model(name, bundle)
    task_types = ("classification",) * 3 if name == "ESMM" else bundle.task_types
    y_train, y_test = bundle.y_train, bundle.y_test
    if name == "ESMM":
        # [cvr, ctr] -> [cvr, ctr, ctcvr]; loss over ctr+ctcvr only (trainer handles it)
        y_train = np.concatenate([y_train, y_train[:, :1] * y_train[:, 1:2]], axis=1)
        y_test = np.concatenate([y_test, y_test[:, :1] * y_test[:, 1:2]], axis=1)
    adaptive = {"method": args.adaptive} if args.adaptive else None
    trainer = MTLTrainer(model, task_types, adaptive_params=adaptive, optimizer_params={"lr": args.learning_rate}, n_epoch=args.epoch, model_path=args.save_dir, seed=args.seed)
    log = trainer.fit(
        ArrayLoader(bundle.x_train, y_train, batch_size=args.batch_size, shuffle=True, seed=args.seed),
        ArrayLoader(bundle.x_test, y_test, batch_size=args.batch_size),
    )
    print("final scores:", log[-1])
    return trainer, log
