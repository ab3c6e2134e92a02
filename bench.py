"""Benchmark entry point — run by the driver on real TPU hardware.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures sustained training throughput (images/sec/chip) of the most
advanced training path currently in the framework.  The reference
publishes no numbers (BASELINE.md); the comparison base is the documented
assumption below, refined as reference measurements land.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Reference A100 throughput assumption for the matching config (see
# BASELINE.md — the reference repo publishes none; this is the working
# estimate for a 2-GPU DDP run divided per GPU, to be replaced by a
# measured number when one exists).
ASSUMED_REF_IPS_PER_CHIP = {
    "cifar_resnet32x4_bs512": 11000.0,  # torch A100 estimate, CIFAR 32x32
    "moma_effib0_512_bs64": 350.0,      # torch A100 estimate, histo 512x512
}


def bench_vanilla_cifar(batch_size: int = 512, steps: int = 50, warmup: int = 10):
    from moma_tpu.core.mesh import create_mesh, data_sharding, replicated_sharding
    from moma_tpu.core.schedules import lr_schedule
    from moma_tpu.data.augment import cifar_train_augment
    from moma_tpu.models import create_model
    from moma_tpu.train.state import TrainState, make_sgd
    from moma_tpu.train.steps import make_vanilla_train_step

    mesh = create_mesh()
    model = create_model("resnet32x4", num_classes=100, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3), jnp.bfloat16), train=False
    )
    tx = make_sgd(lr_schedule(0.05, 240, 100, cosine=True), 0.9, 5e-4)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
    )
    state = jax.device_put(state, replicated_sharding(mesh))
    step_fn = make_vanilla_train_step(augment_fn=cifar_train_augment, donate=True)

    rng_img = np.random.RandomState(0)
    images = rng_img.randint(0, 256, (batch_size, 32, 32, 3), dtype=np.uint8)
    labels = rng_img.randint(0, 100, (batch_size,)).astype(np.int32)
    batch = {
        "image": jax.device_put(images, data_sharding(mesh)),
        "label": jax.device_put(labels, data_sharding(mesh, ndim=1)),
    }
    rng = jax.random.PRNGKey(1)

    for i in range(warmup):
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, i))
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, 1000 + i))
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    n_chips = len(jax.devices())
    ips_per_chip = batch_size * steps / dt / n_chips
    return ips_per_chip, "cifar_resnet32x4_bs512"


def main():
    ips, key = bench_vanilla_cifar()
    ref = ASSUMED_REF_IPS_PER_CHIP[key]
    print(
        json.dumps(
            {
                "metric": f"train images/sec/chip ({key})",
                "value": round(ips, 1),
                "unit": "img/s/chip",
                "vs_baseline": round(ips / ref, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
