"""Head-to-head MMOE (multi-task) and DIN (sequence ranking) parity.

Identical data + hyperparameters in both frameworks; learnable synthetic
signals so AUC differences are meaningful (the committed 100-row samples are
noise-level for both).  Measured results recorded in BASELINE.md.
"""

import contextlib
import io
import os
import sys

import numpy as np

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
os.makedirs("/tmp/fake_meta/torch_rechub-0.0.3.dist-info", exist_ok=True)
_meta = "/tmp/fake_meta/torch_rechub-0.0.3.dist-info/METADATA"
if not os.path.exists(_meta):
    with open(_meta, "w") as f:
        f.write("Metadata-Version: 2.1\nName: torch-rechub\nVersion: 0.0.3\n")
sys.path.insert(0, "/tmp/fake_meta")
sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

EMB, BS, EPOCHS = 8, 256, int(os.environ.get("PARITY_EPOCHS", 5))
LR = float(os.environ.get("PARITY_LR", 1e-3))


def mtl_data(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    x = {f"cat_{i}": rng.integers(0, 40, n).astype(np.int64) for i in range(6)}
    l1 = (x["cat_0"] % 3 == 0) * 1.5 + (x["cat_2"] % 5 == 1) * 1.0 - 0.8
    l2 = (x["cat_1"] % 2) * 1.2 + (x["cat_3"] % 4 == 2) * 0.8 - 0.7
    y = np.stack([
        (rng.random(n) < 1 / (1 + np.exp(-l1))).astype(np.float32),
        (rng.random(n) < 1 / (1 + np.exp(-l2))).astype(np.float32),
    ], 1)
    split = int(n * 0.8)
    return ({k: v[:split] for k, v in x.items()}, y[:split], {k: v[split:] for k, v in x.items()}, y[split:])


def mmoe_reference(seed, data):
    import torch

    from torch_rechub.basic.features import SparseFeature as TS
    from torch_rechub.models.multi_task import MMOE as TMMOE
    from torch_rechub.trainers import MTLTrainer as TMTL
    from torch_rechub.utils.data import DataGenerator as TDG

    torch.manual_seed(seed)
    x_tr, y_tr, x_te, y_te = data
    feats = [TS(f"cat_{i}", vocab_size=40, embed_dim=EMB) for i in range(6)]
    m = TMMOE(feats, ["classification", "classification"], 4, {"dims": [32]}, [{"dims": [16]}, {"dims": [16]}])
    os.makedirs(f"/tmp/pm_t{seed}", exist_ok=True)
    t = TMTL(m, ["classification", "classification"], optimizer_params={"lr": LR, "weight_decay": 1e-5}, n_epoch=EPOCHS, device="cpu", model_path=f"/tmp/pm_t{seed}")
    dl, val, _ = TDG(x=x_tr, y=y_tr).generate_dataloader(x_val=x_te, y_val=y_te, x_test=x_te, y_test=y_te, batch_size=BS)
    with contextlib.redirect_stdout(io.StringIO()):
        t.fit(dl, val)
        scores = t.evaluate(t.model, val)
    return scores


def mmoe_ours(seed, data):
    from torch_rechub_tpu.basic.features import SparseFeature
    from torch_rechub_tpu.models.multi_task import MMOE
    from torch_rechub_tpu.trainers import MTLTrainer
    from torch_rechub_tpu.utils.data import ArrayLoader

    x_tr, y_tr, x_te, y_te = data
    feats = tuple(SparseFeature(f"cat_{i}", vocab_size=40, embed_dim=EMB) for i in range(6))
    m = MMOE(feats, ("classification", "classification"), 4, {"dims": (32,)}, ({"dims": (16,)}, {"dims": (16,)}))
    t = MTLTrainer(m, ("classification", "classification"), optimizer_params={"lr": LR, "weight_decay": 1e-5}, n_epoch=EPOCHS, model_path=f"/tmp/pm_o{seed}", seed=seed)
    x_tr32 = {k: v.astype(np.int32) for k, v in x_tr.items()}
    x_te32 = {k: v.astype(np.int32) for k, v in x_te.items()}
    with contextlib.redirect_stdout(io.StringIO()):
        t.fit(ArrayLoader(x_tr32, y_tr, batch_size=BS, shuffle=True, seed=seed), ArrayLoader(x_te32, y_te, batch_size=BS))
        scores = t.evaluate(m, ArrayLoader(x_te32, y_te, batch_size=BS))
    return scores


def din_data(n=3000, n_items=60, seq_len=20, seed=0):
    """Target attention signal: label = target item appeared in history."""
    rng = np.random.default_rng(seed)
    hist = np.zeros((n, seq_len), dtype=np.int64)
    lengths = rng.integers(5, seq_len + 1, n)
    for i, l in enumerate(lengths):
        hist[i, :l] = rng.integers(1, n_items, l)
    target = rng.integers(1, n_items, n)
    in_hist = np.array([t in set(h[h > 0]) for t, h in zip(target, hist)])
    y = np.where(in_hist, rng.random(n) < 0.85, rng.random(n) < 0.15).astype(np.float32)
    x = {"hist_item_id": hist, "target_item_id": target.astype(np.int64), "user_cat": rng.integers(0, 10, n).astype(np.int64)}
    split = int(n * 0.8)
    return ({k: v[:split] for k, v in x.items()}, y[:split], {k: v[split:] for k, v in x.items()}, y[split:], n_items)


def din_reference(seed, data):
    import torch

    from torch_rechub.basic.features import SequenceFeature as TSeq, SparseFeature as TS
    from torch_rechub.models.ranking import DIN as TDIN
    from torch_rechub.trainers import CTRTrainer as TT
    from torch_rechub.utils.data import DataGenerator as TDG

    torch.manual_seed(seed)
    x_tr, y_tr, x_te, y_te, n_items = data
    target = [TS("target_item_id", vocab_size=n_items, embed_dim=EMB)]
    history = [TSeq("hist_item_id", vocab_size=n_items, embed_dim=EMB, pooling="concat", shared_with="target_item_id")]
    profile = [TS("user_cat", vocab_size=10, embed_dim=EMB)]
    m = TDIN(features=profile, history_features=history, target_features=target, mlp_params={"dims": [32]}, attention_mlp_params={"dims": [16]})
    os.makedirs(f"/tmp/pd_t{seed}", exist_ok=True)
    t = TT(m, optimizer_params={"lr": LR, "weight_decay": 1e-5}, n_epoch=EPOCHS, earlystop_patience=100, device="cpu", model_path=f"/tmp/pd_t{seed}")
    dl, _, _ = TDG(x=x_tr, y=y_tr).generate_dataloader(split_ratio=None, batch_size=BS)
    import torch.utils.data as tud

    from torch_rechub.utils.data import TorchDataset

    with contextlib.redirect_stdout(io.StringIO()):
        t.fit(dl)
        auc = t.evaluate(t.model, tud.DataLoader(TorchDataset(x_te, y_te), batch_size=BS))
    return auc


def din_ours(seed, data):
    from torch_rechub_tpu.basic.features import SequenceFeature, SparseFeature
    from torch_rechub_tpu.models.ranking import DIN
    from torch_rechub_tpu.trainers import CTRTrainer
    from torch_rechub_tpu.utils.data import ArrayLoader

    x_tr, y_tr, x_te, y_te, n_items = data
    target = (SparseFeature("target_item_id", vocab_size=n_items, embed_dim=EMB),)
    history = (SequenceFeature("hist_item_id", vocab_size=n_items, embed_dim=EMB, pooling="concat", shared_with="target_item_id"),)
    profile = (SparseFeature("user_cat", vocab_size=10, embed_dim=EMB),)
    m = DIN(features=profile, history_features=history, target_features=target, mlp_params={"dims": (32,)}, attention_mlp_params={"dims": (16,)})
    t = CTRTrainer(m, optimizer_params={"lr": LR, "weight_decay": 1e-5}, n_epoch=EPOCHS, model_path=f"/tmp/pd_o{seed}", seed=seed)
    x_tr32 = {k: v.astype(np.int32) for k, v in x_tr.items()}
    x_te32 = {k: v.astype(np.int32) for k, v in x_te.items()}
    with contextlib.redirect_stdout(io.StringIO()):
        t.fit(ArrayLoader(x_tr32, y_tr, batch_size=BS, shuffle=True, seed=seed))
        auc = t.evaluate(m, ArrayLoader(x_te32, y_te, batch_size=BS))
    return auc


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    seeds = (0, 1, 2)
    mm_t, mm_o = [], []
    for s in seeds:
        d = mtl_data(seed=42)  # fixed data; vary model init seed
        mm_t.append(mmoe_reference(s, d))
        mm_o.append(mmoe_ours(s, d))
        print(f"MMOE seed {s}: reference {['%.4f' % v for v in mm_t[-1]]}  ours {['%.4f' % v for v in mm_o[-1]]}")
    print(f"MMOE mean AUC: reference {np.mean(mm_t):.4f}  ours {np.mean(mm_o):.4f}")
    din_t, din_o = [], []
    for s in seeds:
        d = din_data(seed=42)
        din_t.append(din_reference(s, d))
        din_o.append(din_ours(s, d))
        print(f"DIN seed {s}: reference {din_t[-1]:.4f}  ours {din_o[-1]:.4f}")
    print(f"DIN mean AUC: reference {np.mean(din_t):.4f}+-{np.std(din_t):.4f}  ours {np.mean(din_o):.4f}+-{np.std(din_o):.4f}")


if __name__ == "__main__":
    main()
