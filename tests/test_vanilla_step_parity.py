"""Vanilla supervised training parity vs the reference: TWO full steps of
CE + torch.optim.SGD(momentum=0.9, weight_decay=5e-4) against our jitted
step with the optax chain.

Two steps are the point: the first step is identical under several wrong
momentum/weight-decay orderings (buffer starts at zero); the second step
separates torch's coupled semantics (wd added to the grad BEFORE the
momentum buffer, update = -lr * buf) from decoupled or post-momentum
variants.  Also pins BN batch-stats updates across steps (torch running
stats vs flax batch_stats) and the eval forward after training.
"""

import copy
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference tree not available",
)
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B, HW, N_CLS = 8, 32, 10
LR, MOM, WD = 0.05, 0.9, 5e-4


def test_two_step_vanilla_parity():
    from models.resnet import resnet8

    from moma_tpu.core.mesh import create_mesh, data_sharding, replicated_sharding
    from moma_tpu.models import create_model
    from moma_tpu.models.torch_import import convert_state_dict
    from moma_tpu.train.state import TrainState, make_sgd
    from moma_tpu.train.steps import make_vanilla_train_step

    rs = np.random.RandomState(9)
    images = [rs.rand(B, 3, HW, HW).astype(np.float32) for _ in range(2)]
    labels = [rs.randint(0, N_CLS, (B,)).astype(np.int64) for _ in range(2)]

    # ---- reference: 2 steps of the train_vanilla hot loop
    # (helper/loops_moma.py:25-63) with the reference's SGD settings
    # (train_teacher.py:180-184)
    torch.manual_seed(0)
    model = resnet8(num_classes=N_CLS)
    snap = copy.deepcopy(model.state_dict())
    opt = torch.optim.SGD(model.parameters(), lr=LR, momentum=MOM,
                          weight_decay=WD)
    model.train()
    ref_losses = []
    for i in range(2):
        logit = model(torch.from_numpy(images[i]))
        loss = torch.nn.CrossEntropyLoss()(logit, torch.from_numpy(labels[i]))
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss.detach()))
    post_ref = {k: v.numpy().copy() for k, v in model.state_dict().items()}

    # ---- ours: same weights, same batches, 2 jitted steps
    mesh = create_mesh()
    jmodel = create_model("resnet8", num_classes=N_CLS)
    variables = jmodel.init(
        jax.random.PRNGKey(0), jnp.zeros((2, HW, HW, 3)), train=False
    )
    conv = convert_state_dict({k: v.numpy() for k, v in snap.items()}, variables)
    tx = make_sgd(LR, momentum=MOM, weight_decay=WD)
    state = TrainState.create(
        apply_fn=jmodel.apply, params=conv["params"],
        batch_stats=conv["batch_stats"], tx=tx,
    )
    state = jax.device_put(state, replicated_sharding(mesh))
    step_fn = make_vanilla_train_step(augment_fn=None, donate=False)
    got_losses = []
    for i in range(2):
        batch = {
            "image": jax.device_put(np.transpose(images[i], (0, 2, 3, 1)),
                                    data_sharding(mesh)),
            "label": jax.device_put(labels[i].astype(np.int32),
                                    data_sharding(mesh, ndim=1)),
        }
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        got_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(got_losses, ref_losses, rtol=3e-4)

    # post-training weights AND BN running stats must match elementwise
    conv_post = convert_state_dict(
        post_ref, {"params": conv["params"], "batch_stats": conv["batch_stats"]}
    )
    for tree_got, tree_want, what in (
        (state.params, conv_post["params"], "params"),
        (state.batch_stats, conv_post["batch_stats"], "batch_stats"),
    ):
        flat_want = jax.tree_util.tree_leaves_with_path(tree_want)
        flat_got = dict(jax.tree_util.tree_leaves_with_path(
            jax.tree_util.tree_map(np.asarray, tree_got)
        ))
        assert flat_want
        for path, want in flat_want:
            np.testing.assert_allclose(
                flat_got[path], want, rtol=5e-3, atol=3e-5,
                err_msg=f"{what}{path}",
            )

    # eval forward after the 2 steps agrees too (running stats in use)
    model.eval()
    with torch.no_grad():
        want_logits = model(torch.from_numpy(images[0])).numpy()
    _, got_logits = jmodel.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(np.transpose(images[0], (0, 2, 3, 1))), train=False,
    )
    got_logits = np.asarray(
        jax.device_get(got_logits), np.float32
    )
    np.testing.assert_allclose(got_logits, want_logits, rtol=1e-3, atol=2e-4)
