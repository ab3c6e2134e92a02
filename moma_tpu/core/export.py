"""Model export for serving — jax.export (StableHLO) serialization.

The reference has no deployment story beyond loading torch checkpoints in
Python (`test.py`).  Production serving on TPU wants a self-contained,
Python-model-free artifact: this module serializes the jitted eval
forward (normalize -> backbone -> logits) with a SYMBOLIC batch
dimension, so one artifact serves any batch size, and reloads it without
the model zoo (only jax + the .stablehlo bytes).

Format: <path>.stablehlo (serialized jax.export blob) + <path>.json meta
(model name, image size, class count, normalization constants).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jex


def export_classifier(
    apply_fn: Callable,
    variables: dict,
    image_size: int,
    path: str,
    normalize: Optional[Callable] = None,
    meta: Optional[dict] = None,
) -> str:
    """Serialize `logits = apply_fn(variables, normalize(uint8 images))`.

    The weights are BAKED into the artifact (closure capture -> constants)
    and the batch dimension is symbolic.  Returns the .stablehlo path.
    """

    def predict(images):  # (B, H, W, 3) uint8
        # pass the RAW uint8 through: normalize fns divide by 255 only for
        # uint8 inputs (data/augment.py:29-31) — pre-casting to float32
        # would silently skip the scaling and serve garbage logits
        x = normalize(images) if normalize is not None else (
            images.astype(jnp.float32)
        )
        out = apply_fn(variables, x, train=False)
        # backbones return (feats, logits)
        logits = out[1] if isinstance(out, tuple) else out
        return logits.astype(jnp.float32)

    (b,) = jex.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, image_size, image_size, 3), jnp.uint8)
    exp = jex.export(jax.jit(predict))(spec)
    blob = exp.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    hlo_path = path if path.endswith(".stablehlo") else path + ".stablehlo"
    with open(hlo_path, "wb") as f:
        f.write(blob)
    with open(hlo_path[: -len(".stablehlo")] + ".json", "w") as f:
        json.dump({"image_size": image_size, **(meta or {})}, f, indent=2)
    return hlo_path


class ExportedClassifier:
    """Reloaded serving artifact: `logits = clf(uint8_images)`; no model
    zoo or checkpoint code needed, any batch size."""

    def __init__(self, path: str):
        hlo_path = path if path.endswith(".stablehlo") else path + ".stablehlo"
        with open(hlo_path, "rb") as f:
            self._exp = jex.deserialize(f.read())
        # jit the call: the raw Exported.call re-lowers on EVERY invocation
        # (measured 29 img/s vs 1000+ for effiB0@512 — pure retrace cost);
        # under jit each batch shape compiles once and is cached.  Routed
        # through jitopt for the 64 MB scoped-VMEM budget: measured on the
        # DEVICE TRACE (module-span median) the bf16 effiB0@512 forward
        # drops 29.28 -> 27.15 ms/call (+7.8%); the earlier wallclock-based
        # null result was masked by relay dispatch stalls (BASELINE.md
        # "Serving floor analysis", session 15)
        from moma_tpu.core import jitopt

        self._call = jitopt.jit(self._exp.call)
        meta_path = hlo_path[: -len(".stablehlo")] + ".json"
        self.meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                self.meta = json.load(f)

    def __call__(self, images) -> jax.Array:
        images = jnp.asarray(images, jnp.uint8)
        return self._call(images)

    def shard(self, mesh=None):
        """Switch to data-parallel serving over a device mesh.

        The artifact is lowered for ONE device (jax.export records
        nr_devices=1), so multi-chip serving wraps it in shard_map over
        the 'data' axis: every device runs the single-device module on
        its batch shard — pure weak scaling, zero collectives (each row's
        logits depend only on that row).  Batches not divisible by the
        device count are padded with row 0 and sliced after (static
        shapes per batch size, like the single-device path).  Returns
        self for chaining.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        if mesh is None:
            from moma_tpu.core.mesh import create_mesh

            mesh = create_mesh()
        self._mesh = mesh
        n = mesh.shape.get("data", 1)
        try:  # jax>=0.8
            smap = jax.shard_map
        except AttributeError:
            from jax.experimental.shard_map import shard_map as smap

        call = self._exp.call

        def run(images):
            f = smap(call, mesh=mesh, in_specs=P("data"), out_specs=P("data"))
            return f(images)

        from moma_tpu.core import jitopt

        sharded = jitopt.jit(run)
        in_shard = NamedSharding(mesh, P("data"))

        def dispatch(images):
            b = images.shape[0]
            pad = (-b) % n
            if pad:
                images = jnp.concatenate(
                    [images, jnp.broadcast_to(images[:1], (pad, *images.shape[1:]))],
                    axis=0,
                )
            logits = sharded(jax.device_put(images, in_shard))
            return logits[:b] if pad else logits

        self._call = dispatch
        return self

    def predict(self, images, batch_size: int = 0) -> np.ndarray:
        """Host-side convenience: optional micro-batching + argmax."""
        images = np.asarray(images, np.uint8)
        if batch_size and images.shape[0] > batch_size:
            parts = [
                np.asarray(self(images[i : i + batch_size]))
                for i in range(0, images.shape[0], batch_size)
            ]
            logits = np.concatenate(parts, axis=0)
        else:
            logits = np.asarray(self(images))
        return logits.argmax(axis=-1)
