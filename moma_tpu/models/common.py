"""Shared model building blocks + the feature-list contract.

Every backbone in the zoo follows the contract the reference establishes
(e.g. `models/resnet.py:164-186`): the forward pass returns
``(feats, logits)`` where ``feats`` is a tuple covering
stem -> per-stage maps -> pre-logit pooled embedding.  Callers that only
need logits take ``[1]``; XLA dead-code-eliminates the unused features, so
there is no is_feat flag (a data-dependent Python branch would force two
traced variants for no benefit).

Layout is NHWC throughout — the TPU-native layout (channels on the lane
dimension feeds the MXU/VPU without transposes).

Initializers match PyTorch defaults so that loss-scale and LR transfer:
  * conv:   kaiming-normal fan_out (reference resnet.py:131-135)
  * linear: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (torch nn.Linear default)
  * BN:     scale=1, bias=0; EMA momentum 0.9 (torch momentum=0.1)
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

# torch kaiming_normal_(mode='fan_out', nonlinearity='relu'): exact normal,
# not truncated (reference resnet.py:131-135)
conv_kernel_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def torch_linear_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch nn.Linear default."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchLinear(nn.Module):
    """Dense layer with torch-default init (so classifiers start identically)."""

    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", torch_linear_init, (fan_in, self.features)
        )
        y = jnp.dot(x, kernel.astype(x.dtype))
        if self.use_bias:
            bias = self.param(
                "bias", torch_linear_bias_init(fan_in), (self.features,)
            )
            y = y + bias.astype(x.dtype)
        return y


class BatchNorm(nn.Module):
    """BatchNorm with torch conventions (momentum 0.1 -> flax 0.9, eps 1e-5).

    ``use_running_average`` switches train/eval statistics exactly like
    torch's module.train()/.eval().  When ``axis_name`` is set, batch
    statistics are computed across the named mesh axis (sync-BN — the
    TPU-idiomatic alternative to Shuffle-BN; see SURVEY.md §2.3).

    Backed by ops/fused_bn.FusedBatchNorm: train-mode statistics and
    gradient reductions run through lane-packed Pallas kernels on TPU
    (the round-1 trace showed XLA's NHWC channel reductions at ~4% of HBM
    bandwidth = 56% of the MoMA step); numerics and the variable tree are
    exactly nn.BatchNorm's (child kept named 'BatchNorm_0').
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x):
        from moma_tpu.ops.fused_bn import FusedBatchNorm

        return FusedBatchNorm(
            use_running_average=self.use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            axis_name=self.axis_name,
            name="BatchNorm_0",
        )(x)


def global_avg_pool(x: Array) -> Array:
    """NHWC -> NC pooled embedding (reference avgpool + flatten)."""
    return jnp.mean(x, axis=(1, 2))


FeatsAndLogits = Tuple[Tuple[Array, ...], Array]
