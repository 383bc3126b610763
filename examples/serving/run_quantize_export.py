"""Export → quantize → serve: the deployment path end to end.

Equivalent of the reference's ``examples/quantize_onnx.py`` +
``examples/benchmark_onnx_quantization.py``: train a two-tower model, export
both towers to StableHLO, quantize parameters (int8 per-channel / fp16),
report size + reconstruction error + retrieval-agreement, then build an ANN
index over item embeddings and serve top-k queries.

    python examples/serving/run_quantize_export.py --backend bruteforce
    python examples/serving/run_quantize_export.py --backend hnsw --mode fp16
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from benchmarks.datasets import build_ml1m_matching_dataset
from torch_rechub_tpu.basic.features import SparseFeature
from torch_rechub_tpu.models.matching import DSSM
from torch_rechub_tpu.serving import builder_factory
from torch_rechub_tpu.trainers import MatchTrainer
from torch_rechub_tpu.utils.data import ArrayLoader
from torch_rechub_tpu.utils.export import load_exported, quantization_error


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--backend", default="bruteforce", choices=("bruteforce", "hnsw", "annoy", "faiss"))
    parser.add_argument("--mode", default="int8", choices=("int8", "fp16"))
    parser.add_argument("--epoch", type=int, default=2)
    parser.add_argument("--embed_dim", type=int, default=16)
    parser.add_argument("--topk", type=int, default=10)
    parser.add_argument("--save_dir", default="./saved/quantize_demo")
    args = parser.parse_args()

    bundle = build_ml1m_matching_dataset(embed_dim=args.embed_dim, mode=0, neg_ratio=3)
    model = DSSM(user_features=bundle.user_features, item_features=bundle.item_features, user_params={"dims": (64, args.embed_dim)}, item_params={"dims": (64, args.embed_dim)})
    trainer = MatchTrainer(model, mode=0, n_epoch=args.epoch, model_path=args.save_dir)
    trainer.fit(ArrayLoader(bundle.x_train, bundle.y_train, batch_size=256, shuffle=True))

    # --- export both towers, fp32 AND quantized-with-in-graph-dequant --------
    examples = {
        "user": {k: np.asarray(v[:8]) for k, v in bundle.x_test_user.items()} if hasattr(bundle, "x_test_user") else {k: np.asarray(v[:8]) for k, v in bundle.x_train.items()},
        "item": {k: np.asarray(v[:8]) for k, v in bundle.x_all_item.items()},
    }
    paths = {}
    for mode in ("user", "item"):
        example = examples[mode]
        path = trainer.export(os.path.join(args.save_dir, f"dssm_{mode}"), example, mode=mode)
        q_path = trainer.export_quantized(os.path.join(args.save_dir, f"dssm_{mode}_{args.mode}"), example, mode=mode, quant_mode=args.mode)
        paths[mode] = (path, q_path)
        fp_kb = os.path.getsize(path[: -len(".stablehlo")] + ".params.msgpack") / 1024
        q_kb = os.path.getsize(q_path[: -len(".stablehlo")] + ".params.msgpack") / 1024
        print(f"exported {mode} tower -> fp32 {fp_kb:.1f} KiB params, {args.mode} artifact {q_kb:.1f} KiB ({fp_kb / max(q_kb, 1e-9):.2f}x smaller)")

    import jax

    params = jax.device_get(trainer.variables()["params"])
    err = quantization_error(params, mode=args.mode)
    print(f"{args.mode} max relative reconstruction error: {err:.4f}")

    # --- run BOTH deployed artifacts: latency + retrieval agreement ----------
    x_items = {k: np.asarray(v) for k, v in bundle.x_all_item.items()}
    run_fp, _ = load_exported(paths["item"][0])
    run_q, _ = load_exported(paths["item"][1])
    # artifacts are fixed-shape; stream in chunks of the export batch size
    b = 8

    def stream(run):
        outs = []
        for i in range(0, len(next(iter(x_items.values()))), b):
            chunk = {k: v[i:i + b] for k, v in x_items.items()}
            n = len(next(iter(chunk.values())))
            if n < b:
                chunk = {k: np.concatenate([v, np.repeat(v[-1:], b - n, axis=0)]) for k, v in chunk.items()}
            outs.append(np.asarray(run(chunk))[:n])
        return np.concatenate(outs)

    t0 = time.perf_counter()
    item_emb = stream(run_fp)
    fp_ms = (time.perf_counter() - t0) * 1000
    t0 = time.perf_counter()
    q_item_emb = stream(run_q)
    q_ms = (time.perf_counter() - t0) * 1000
    print(f"deployed artifact latency over {len(item_emb)} items: fp32 {fp_ms:.1f} ms, {args.mode} {q_ms:.1f} ms")

    fp_top = np.argsort(-np.asarray(item_emb) @ np.asarray(item_emb).T, axis=1)[:, : args.topk]
    q_top = np.argsort(-q_item_emb @ q_item_emb.T, axis=1)[:, : args.topk]
    agree = float(np.mean([len(set(a) & set(b)) / args.topk for a, b in zip(fp_top, q_top)]))
    print(f"top-{args.topk} retrieval agreement fp32 vs {args.mode} artifact: {agree:.3f}")

    # --- build + query the index ---------------------------------------------
    builder = builder_factory(args.backend, metric="ip") if args.backend in ("bruteforce", "hnsw") else builder_factory(args.backend)
    t0 = time.perf_counter()
    with builder.from_embeddings(np.asarray(item_emb)) as indexer:
        build_s = time.perf_counter() - t0
        queries = np.asarray(item_emb[:32])
        t0 = time.perf_counter()
        ids, dists = indexer.query(queries, args.topk)
        query_ms = (time.perf_counter() - t0) * 1000 / len(queries)
        indexer.save(os.path.join(args.save_dir, f"{args.backend}.index"))
    self_hit = float(np.mean(ids[:, 0] == np.arange(32)))
    print(f"{args.backend}: build {build_s * 1000:.1f} ms, {query_ms:.3f} ms/query, self-top1 hit {self_hit:.2f}")


if __name__ == "__main__":
    main()
