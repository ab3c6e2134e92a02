"""Process worker for the 2-process jax.distributed smoke
(test_multihost_smoke): the DCN-path analog of the reference's
mp.spawn + NCCL rendezvous (base_trainer.py:39-61).

Each process owns ONE CPU device; core.mesh.init_distributed forms the
2-process runtime (gloo collectives), create_mesh spans BOTH processes,
and one jitted vanilla train step runs with the global batch sharded
across processes — the gradient all-reduce crosses the process boundary.
Process 0 writes the resulting loss + a post-step weight probe for the
host test to compare against a single-process global-batch run.

Usage: python jax_multihost_worker.py <pid> <nprocs> <port> <tmpdir>
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PID = int(sys.argv[1])
NPROCS = int(sys.argv[2])
PORT = sys.argv[3]
TMP = sys.argv[4]

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from moma_tpu.core.mesh import (  # noqa: E402
    create_mesh,
    data_sharding,
    init_distributed,
    replicated_sharding,
)

init_distributed(coordinator=f"127.0.0.1:{PORT}", num_processes=NPROCS,
                 process_id=PID)
assert jax.device_count() == NPROCS, jax.device_count()
assert jax.local_device_count() == 1

from moma_tpu.data.augment import cifar_eval_normalize  # noqa: E402
from moma_tpu.models import create_model  # noqa: E402
from moma_tpu.train.state import TrainState, make_sgd  # noqa: E402
from moma_tpu.train.steps import make_vanilla_train_step  # noqa: E402

data = np.load(os.path.join(TMP, "batch.npz"))
images, labels = data["images"], data["labels"]
B = images.shape[0]

mesh = create_mesh()  # ('data', 'model') spanning BOTH processes
model = create_model("resnet8", num_classes=10)
variables = model.init(
    jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), train=False
)
state = TrainState.create(
    apply_fn=model.apply, params=variables["params"],
    batch_stats=variables["batch_stats"],
    tx=make_sgd(0.1, momentum=0.0, weight_decay=0.0),
)
state = jax.device_put(state, replicated_sharding(mesh))

# global batch assembled from per-process shards (the DistributedSampler
# equivalent: each process materializes only its rows)
img_sh = data_sharding(mesh)
lab_sh = data_sharding(mesh, ndim=1)
batch = {
    "image": jax.make_array_from_callback(
        images.shape, img_sh, lambda idx: images[idx]
    ),
    "label": jax.make_array_from_callback(
        labels.shape, lab_sh, lambda idx: labels[idx]
    ),
}

step = make_vanilla_train_step(
    augment_fn=lambda im, r: cifar_eval_normalize(im), donate=False
)
new_state, metrics = step(state, batch, jax.random.PRNGKey(7))
loss = float(metrics["loss"])  # replicated scalar — fetch forces the chain
acc = float(metrics["acc1"])

# post-step weight probe: the first conv kernel's mean (fully replicated;
# identical across processes iff the cross-process grad reduce worked)
leaf = jax.tree_util.tree_leaves(new_state.params)[0]
probe = float(jnp.mean(leaf))

if PID == 0:
    with open(os.path.join(TMP, "result.json"), "w") as f:
        json.dump({"loss": loss, "acc1": acc, "probe": probe,
                   "devices": jax.device_count()}, f)
print(f"proc {PID}: ok loss={loss:.6f} probe={probe:.8f}")
