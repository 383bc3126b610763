"""YAML-config benchmark runner.

Parity with reference ``benchmarks/runner.py:48-367``: seed everything,
capture environment metadata, dispatch by task with per-stage
``time.perf_counter`` timing, write ``result.yaml`` + ``summary.md``, and
optional ``--check-baseline`` (exit non-zero on regression).  New columns vs
the reference: ``examples_per_s``, device/backend info.

Usage: ``python benchmarks/runner.py --config benchmarks/configs/ranking/criteo_deepfm.yaml [--check-baseline]``
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.baselines import compare_to_baseline, load_baselines, record_baseline
from benchmarks.datasets import build_census_multitask_dataset, build_criteo_ranking_dataset, build_ml1m_matching_dataset
from benchmarks.metrics import evaluate_binary_ranking, evaluate_retrieval, multitask_scores
from benchmarks.models import build_matching_model, build_multitask_model, build_ranking_model, count_parameters
from benchmarks.report import write_result
from benchmarks.schema import validate_config


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def environment_metadata() -> dict:
    import subprocess

    import jax

    meta = {"jax_version": jax.__version__, "backend": jax.default_backend(), "n_devices": jax.device_count()}
    try:
        meta["git_commit"] = subprocess.run(["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True, cwd=os.path.dirname(__file__)).stdout.strip()
    except Exception:
        pass
    return meta


def run_ranking_benchmark(config: dict) -> dict:
    from torch_rechub_tpu.trainers import CTRTrainer
    from torch_rechub_tpu.utils.data import ArrayLoader

    t0 = time.perf_counter()
    bundle = build_criteo_ranking_dataset(seed=config.get("seed", 2022), embed_dim=config.get("embed_dim", 16))
    data_s = time.perf_counter() - t0

    model = build_ranking_model(config["model"], bundle, config.get("model_params"))
    trainer = CTRTrainer(model, optimizer_params={"lr": config.get("learning_rate", 1e-3), "weight_decay": config.get("weight_decay", 1e-5)}, n_epoch=config.get("epochs", 1), model_path=config.get("output_dir", "/tmp/bench_out"), seed=config.get("seed", 2022), precision=config.get("precision"))
    bs = config.get("batch_size", 256)
    train_dl = ArrayLoader(bundle.x_train, bundle.y_train, batch_size=bs, shuffle=True, seed=config.get("seed", 2022))
    test_dl = ArrayLoader(bundle.x_test, bundle.y_test, batch_size=bs)
    t0 = time.perf_counter()
    trainer.fit(train_dl)
    train_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    preds = trainer.predict(model, test_dl)
    infer_s = time.perf_counter() - t0
    metrics = evaluate_binary_ranking(bundle.y_test, preds, config.get("metrics", ["AUC", "LogLoss"]))
    n_examples = len(bundle.y_train) * config.get("epochs", 1)
    return {"metrics": metrics, "parameter_count": count_parameters(trainer.state.params), "runtime": {"data_seconds": data_s, "train_seconds": train_s, "infer_seconds": infer_s, "examples_per_s": n_examples / max(train_s, 1e-9)}}


def run_matching_benchmark(config: dict) -> dict:
    from torch_rechub_tpu.trainers import MatchTrainer
    from torch_rechub_tpu.utils.data import ArrayLoader

    t0 = time.perf_counter()
    mode = config.get("mode", 2)
    bundle = build_ml1m_matching_dataset(seed=config.get("seed", 2022), embed_dim=config.get("embed_dim", 16), mode=mode, neg_ratio=config.get("neg_ratio", 3), seq_max_len=config.get("seq_max_len", 20))
    data_s = time.perf_counter() - t0
    model = build_matching_model(config["model"], bundle, config.get("model_params"))
    trainer = MatchTrainer(model, mode=mode, optimizer_params={"lr": config.get("learning_rate", 1e-3), "weight_decay": config.get("weight_decay", 1e-5)}, n_epoch=config.get("epochs", 1), model_path=config.get("output_dir", "/tmp/bench_out"), seed=config.get("seed", 2022), precision=config.get("precision"))
    bs = config.get("batch_size", 256)
    t0 = time.perf_counter()
    trainer.fit(ArrayLoader(bundle.x_train, bundle.y_train, batch_size=bs, shuffle=True))
    train_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    drop_neg = {k: v for k, v in bundle.x_test_user.items() if not k.startswith("neg")}
    user_emb = trainer.inference_embedding(model, "user", ArrayLoader(drop_neg, batch_size=bs), config.get("output_dir", "/tmp/bench_out"))
    item_emb = trainer.inference_embedding(model, "item", ArrayLoader(bundle.x_all_item, batch_size=bs), config.get("output_dir", "/tmp/bench_out"))
    infer_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    metrics = evaluate_retrieval(user_emb, item_emb, bundle.test_user, bundle.x_all_item, "user_id", "movie_id", config.get("topk", 10), beyond_accuracy=bool(config.get("beyond_accuracy", False)))
    eval_s = time.perf_counter() - t0
    return {"metrics": metrics, "parameter_count": count_parameters(trainer.state.params), "runtime": {"data_seconds": data_s, "train_seconds": train_s, "infer_seconds": infer_s, "eval_seconds": eval_s}}


def run_multitask_benchmark(config: dict) -> dict:
    from torch_rechub_tpu.trainers import MTLTrainer
    from torch_rechub_tpu.utils.data import ArrayLoader

    t0 = time.perf_counter()
    bundle = build_census_multitask_dataset(seed=config.get("seed", 2022), embed_dim=config.get("embed_dim", 8))
    data_s = time.perf_counter() - t0
    model = build_multitask_model(config["model"], bundle, config.get("model_params"))
    task_types = bundle.task_types
    if config["model"] == "ESMM":
        task_types = ("classification",) * 3
    adaptive = {"method": config["adaptive_method"]} if config.get("adaptive_method") else None
    trainer = MTLTrainer(model, task_types, adaptive_params=adaptive, optimizer_params={"lr": config.get("learning_rate", 1e-3), "weight_decay": config.get("weight_decay", 1e-5)}, n_epoch=config.get("epochs", 1), model_path=config.get("output_dir", "/tmp/bench_out"), seed=config.get("seed", 2022), precision=config.get("precision"))
    bs = config.get("batch_size", 256)
    y_train, y_test = bundle.y_train, bundle.y_test
    if config["model"] == "ESMM":
        y_train = np.concatenate([y_train, (y_train[:, :1] * y_train[:, 1:2])], axis=1)
        y_test = np.concatenate([y_test, (y_test[:, :1] * y_test[:, 1:2])], axis=1)
    t0 = time.perf_counter()
    trainer.fit(ArrayLoader(bundle.x_train, y_train, batch_size=bs, shuffle=True), ArrayLoader(bundle.x_test, y_test, batch_size=bs))
    train_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    preds = trainer.predict(model, ArrayLoader(bundle.x_test, y_test, batch_size=bs))
    infer_s = time.perf_counter() - t0
    metrics = multitask_scores(task_types, y_test, preds)
    return {"metrics": metrics, "parameter_count": count_parameters(trainer.state.params), "runtime": {"data_seconds": data_s, "train_seconds": train_s, "infer_seconds": infer_s}}


def run_benchmark(config: dict) -> dict:
    set_seed(config.get("seed", 2022))
    task = config["task"]
    if task == "ranking":
        result = run_ranking_benchmark(config)
    elif task == "matching":
        result = run_matching_benchmark(config)
    elif task == "multitask":
        result = run_multitask_benchmark(config)
    else:  # pragma: no cover - schema already validates
        raise ValueError(task)
    result["name"] = config.get("name", f"{task}_{config['model']}")
    result["task"] = task
    result["model"] = config["model"]
    result["dataset"] = config["dataset"]
    result["config"] = config
    result["environment"] = environment_metadata()
    return result


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--check-baseline", action="store_true")
    parser.add_argument("--record", action="store_true", help="rewrite this config's baseline expected values from this run (keeps tolerances)")
    parser.add_argument("--baseline-file", default=None)
    parser.add_argument("--profile", default=None, metavar="DIR", help="capture a jax.profiler trace of the run into DIR (view in TensorBoard)")
    args = parser.parse_args(argv)

    with open(args.config) as f:
        config = yaml.safe_load(f)
    validate_config(config)
    output_dir = config.get("output_dir") or os.path.join("/tmp/bench_out", config.get("name", "run"))
    config["output_dir"] = output_dir

    if args.profile:
        from torch_rechub_tpu.utils.profiling import trace

        with trace(args.profile):
            result = run_benchmark(config)
        print(f"profiler trace written to {args.profile} (view with TensorBoard)")
    else:
        result = run_benchmark(config)

    diffs = None
    baseline_file = args.baseline_file or os.path.join(os.path.dirname(args.config), "..", "..", "baselines", f"{config['task']}.yaml")
    if args.record:
        entry = record_baseline(baseline_file, config.get("name", ""), result["metrics"])
        print(f"recorded baseline for {config.get('name', '')} in {os.path.normpath(baseline_file)}: {entry}")
    if args.check_baseline:
        baselines = load_baselines(baseline_file)
        entry = baselines.get(config.get("name", ""), {})
        diffs = compare_to_baseline(result["metrics"], entry)
    write_result(output_dir, result, diffs)
    print(yaml.safe_dump({"metrics": result["metrics"], "runtime": result["runtime"]}, sort_keys=False))
    if diffs and any(not d.passed for d in diffs):
        print("BASELINE REGRESSION DETECTED", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
