"""Head-to-head DSSM parity on LEARNABLE synthetic retrieval data.

The ML-1M 101-row sample gives noise-level (mostly zero) recalls for both
frameworks; this script instead uses a block-preference structure both models
can learn, trained with identical data/hyperparameters.  Measured round 1:
reference 0.981 recall@10, ours 0.968 - parity.
"""
import os, sys
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
os.makedirs("/tmp/fake_meta/torch_rechub-0.0.3.dist-info", exist_ok=True)
_meta = "/tmp/fake_meta/torch_rechub-0.0.3.dist-info/METADATA"
if not os.path.exists(_meta):
    with open(_meta, "w") as f:
        f.write("Metadata-Version: 2.1\nName: torch-rechub\nVersion: 0.0.3\n")
sys.path.insert(0, "/tmp/fake_meta")
sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np, contextlib, io

# learnable block structure: user u likes items in block u%10
rng = np.random.default_rng(0)
N_USERS, N_ITEMS, N = 200, 100, 6000
users = rng.integers(1, N_USERS, N)
pos_items = ((users % 10) * 10 + rng.integers(0, 10, N)).clip(1, N_ITEMS-1)
neg_items = rng.integers(1, N_ITEMS, N)
x_train = {"user_id": np.concatenate([users, users]).astype(np.int64),
           "movie_id": np.concatenate([pos_items, neg_items]).astype(np.int64)}
y_train = np.concatenate([np.ones(N), np.zeros(N)]).astype(np.float32)
test_users = np.arange(1, N_USERS).astype(np.int64)
all_item = {"movie_id": np.arange(N_ITEMS).astype(np.int64)}
EPOCHS, BS, EMB = 10, 256, 16

import torch
from torch_rechub.basic.features import SparseFeature as TS
from torch_rechub.models.matching import DSSM as TDSSM
from torch_rechub.trainers import MatchTrainer as TT
from torch_rechub.utils.data import MatchDataGenerator as TMDG
torch.manual_seed(0)
tm = TDSSM([TS("user_id", N_USERS, EMB)], [TS("movie_id", N_ITEMS, EMB)],
           user_params={"dims":[64, 32]}, item_params={"dims":[64, 32]})
os.makedirs("/tmp/dd_t", exist_ok=True)
tt = TT(tm, mode=0, optimizer_params={"lr":1e-3,"weight_decay":1e-6}, n_epoch=EPOCHS, device="cpu", model_path="/tmp/dd_t")
dl, test_dl, item_dl = TMDG(x=x_train, y=y_train).generate_dataloader({"user_id": test_users}, all_item, batch_size=BS)
with contextlib.redirect_stdout(io.StringIO()):
    tt.fit(dl)
    t_user = tt.inference_embedding(tm, "user", test_dl, "/tmp/dd_t").numpy()
    t_item = tt.inference_embedding(tm, "item", item_dl, "/tmp/dd_t").numpy()

from torch_rechub_tpu.basic.features import SparseFeature
from torch_rechub_tpu.models.matching import DSSM
from torch_rechub_tpu.trainers import MatchTrainer
from torch_rechub_tpu.utils.data import ArrayLoader
om = DSSM((SparseFeature("user_id", N_USERS, EMB),), (SparseFeature("movie_id", N_ITEMS, EMB),),
          user_params={"dims":(64, 32)}, item_params={"dims":(64, 32)})
ot = MatchTrainer(om, mode=0, optimizer_params={"lr":1e-3,"weight_decay":1e-6}, n_epoch=EPOCHS, model_path="/tmp/dd_o", seed=0)
with contextlib.redirect_stdout(io.StringIO()):
    ot.fit(ArrayLoader({k: v.astype(np.int32) for k,v in x_train.items()}, y_train, batch_size=BS, shuffle=True))
    o_user = ot.inference_embedding(om, "user", ArrayLoader({"user_id": test_users.astype(np.int32)}, batch_size=BS), "/tmp/dd_o")
    o_item = ot.inference_embedding(om, "item", ArrayLoader({k: v.astype(np.int32) for k,v in all_item.items()}, batch_size=BS), "/tmp/dd_o")

def recall10(ue, ie):
    scores = ue @ ie.T
    top = np.argsort(-scores, axis=1)[:, :10]
    hits = [len(set(top[i]) & set(range((u%10)*10, (u%10)*10+10)))/10 for i, u in enumerate(test_users)]
    return float(np.mean(hits))
print("reference recall@10:", recall10(t_user, t_item))
print("ours      recall@10:", recall10(o_user, o_item))
