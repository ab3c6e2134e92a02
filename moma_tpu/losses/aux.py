"""Trainable auxiliary modules for the KD loss zoo (Flax, NHWC).

Functional equivalents of the reference's `models/util.py` modules
(ConvReg :7-31, SelfA :33-103, Proj :105-128, MLPEmbed :130-151,
SRRL :164-186, SimKD :188-236, Embed :239-249, LinearEmbed :252-262)
and the VID regressor (distiller_zoo/VID.py:9-37).

Their parameters join the student's optimizer exactly as the reference
appends them to trainable_list (train_student_moma.py:286-380): they live
in the 'aux' branch of DistillState.params.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from moma_tpu.models.common import BatchNorm, TorchLinear, conv_kernel_init
from moma_tpu.losses.functional import adaptive_avg_pool_nhwc, l2_normalize


def _torch_conv_init(key, shape, dtype=jnp.float32):
    """torch nn.Conv2d default: kaiming_uniform(a=sqrt(5)) == U(±sqrt(1/fan_in))
    with fan_in = prod(kernel hw) * in_ch.  flax kernel shape (kh,kw,in,out)."""
    fan_in = int(np.prod(shape[:-1]))
    # kaiming_uniform(a=sqrt(5)): gain = sqrt(2/(1+5)) = 1/sqrt(3);
    # bound = gain * sqrt(3/fan_in) = sqrt(1/fan_in)
    bound = float(np.sqrt(1.0 / fan_in))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class ConvReg(nn.Module):
    """FitNet shape adapter (models/util.py:7-31).

    Maps the student hint layer onto the teacher's (C,H,W); chooses
    stride-2 conv / transpose conv / shrinking kernel by the H ratio, and
    pools the teacher when the student map is smaller.  Returns the pair
    (regressed_student, matched_teacher).
    """

    s_shape: Sequence[int]  # (H, W, C) of student hint
    t_shape: Sequence[int]  # (H, W, C) of teacher hint
    dtype: Any = None

    @nn.compact
    def __call__(self, x, t, train: bool = True):
        s_H, s_W, s_C = self.s_shape
        t_H, t_W, t_C = self.t_shape
        if s_H == 2 * t_H:
            y = nn.Conv(
                t_C, (3, 3), strides=(2, 2), padding=1,
                kernel_init=_torch_conv_init, dtype=self.dtype,
            )(x)
            t_out = t
        elif s_H * 2 == t_H:
            y = nn.ConvTranspose(
                t_C, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                kernel_init=_torch_conv_init, dtype=self.dtype,
            )(x)
            t_out = t
        elif s_H >= t_H:
            y = nn.Conv(
                t_C, (1 + s_H - t_H, 1 + s_W - t_W), padding="VALID",
                kernel_init=_torch_conv_init, dtype=self.dtype,
            )(x)
            t_out = t
        else:
            y = nn.Conv(
                t_C, (3, 3), padding=1,
                kernel_init=_torch_conv_init, dtype=self.dtype,
            )(x)
            t_out = adaptive_avg_pool_nhwc(t, s_H, s_W)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        return nn.relu(y), t_out


class Proj(nn.Module):
    """1x1-3x3-1x1 channel aligner (models/util.py:105-128)."""

    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        mid = 2 * self.out_channels
        y = nn.Conv(mid, (1, 1), use_bias=False, kernel_init=conv_kernel_init,
                    dtype=self.dtype)(x)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(mid, (3, 3), padding=1, use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype)(y)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype)(y)
        return y


class MLPEmbed(nn.Module):
    """linear-relu-linear-l2norm (models/util.py:130-151)."""

    dim_out: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(TorchLinear(2 * self.dim_out, dtype=self.dtype)(x))
        x = TorchLinear(self.dim_out, dtype=self.dtype)(x)
        return l2_normalize(x.astype(jnp.float32), axis=1)


class SelfA(nn.Module):
    """SemCKD cross-layer attention (models/util.py:33-103).

    The 'feat_dim' of the reference is the BATCH SIZE (wired as
    SelfA(opt.batch_size, ...), train_student_moma.py:362): attention runs
    over batch-similarity matrices.  Returns (proj_value_stu, value_tea,
    attention[B, s_len, t_len]).
    """

    s_channels: Sequence[int]
    t_channels: Sequence[int]
    batch_size: int
    soft: float = 1.0
    factor: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, feat_s, feat_t, train: bool = True):
        s_len, t_len = len(feat_s), len(feat_t)
        B = self.batch_size
        qdim = B // self.factor

        sim_s = [
            (lambda f: (f := f.reshape(B, -1)) @ f.T)(f.astype(jnp.float32))
            for f in feat_s
        ]
        sim_t = [
            (lambda f: (f := f.reshape(B, -1)) @ f.T)(f.astype(jnp.float32))
            for f in feat_t
        ]

        queries = jnp.stack(
            [MLPEmbed(qdim, name=f"query_{i}")(sim_s[i]) for i in range(s_len)],
            axis=1,
        )  # (B, s_len, qdim)
        keys = jnp.stack(
            [MLPEmbed(qdim, name=f"key_{i}")(sim_t[i]) for i in range(t_len)],
            axis=2,
        )  # (B, qdim, t_len)
        energy = jnp.einsum("bsq,bqt->bst", queries, keys) / self.soft
        attention = jax.nn.softmax(energy, axis=-1)

        proj_value_stu, value_tea = [], []
        for i in range(s_len):
            proj_value_stu.append([])
            value_tea.append([])
            for j in range(t_len):
                s_H, t_H = feat_s[i].shape[1], feat_t[j].shape[1]
                if s_H > t_H:
                    source = adaptive_avg_pool_nhwc(feat_s[i], t_H, t_H)
                    target = feat_t[j]
                else:
                    source = feat_s[i]
                    target = adaptive_avg_pool_nhwc(feat_t[j], s_H, s_H)
                proj_value_stu[i].append(
                    Proj(self.t_channels[j], name=f"regressor_{i}_{j}",
                         dtype=self.dtype)(source, train=train)
                )
                value_tea[i].append(target)
        return proj_value_stu, value_tea, attention


class VIDRegressor(nn.Module):
    """VID conv regressor + log_scale parameter (distiller_zoo/VID.py:9-37).

    Call returns (pred_mean NHWC, log_scale (C,)); the loss itself is
    losses.functional.vid_loss.
    """

    mid_channels: int
    target_channels: int
    init_pred_var: float = 5.0
    eps: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.mid_channels, (1, 1), use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Conv(self.mid_channels, (1, 1), use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.target_channels, (1, 1), use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype)(y)
        log_scale = self.param(
            "log_scale",
            lambda key, shape: jnp.full(
                shape, float(np.log(np.exp(self.init_pred_var - self.eps) - 1.0))
            ),
            (self.target_channels,),
        )
        return y, log_scale


class SRRL(nn.Module):
    """Softmax-regression representation learning adapter
    (models/util.py:164-186): 1x1 conv + BN + relu lifting the pooled
    student embedding into teacher feature space; the caller then applies
    the teacher classifier."""

    t_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, feat_s, train: bool = True):
        x = feat_s[:, None, None, :]  # (B,1,1,C)
        y = nn.Conv(self.t_dim, (1, 1), use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype)(x)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        return y.reshape(y.shape[0], -1)


class SimKD(nn.Module):
    """Reused-teacher-classifier bottleneck (models/util.py:188-236).

    Returns (trans_feat_s NHWC, trans_feat_t NHWC, pooled_student (B,C));
    the caller applies the teacher classifier to the pooled output.
    """

    t_channels: int
    factor: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, feat_s, feat_t, train: bool = True):
        s_H, t_H = feat_s.shape[1], feat_t.shape[1]
        if s_H > t_H:
            source = adaptive_avg_pool_nhwc(feat_s, t_H, t_H)
            target = feat_t
        else:
            source = feat_s
            target = adaptive_avg_pool_nhwc(feat_t, s_H, s_H)

        mid = self.t_channels // self.factor
        y = nn.Conv(mid, (1, 1), use_bias=False, kernel_init=conv_kernel_init,
                    dtype=self.dtype)(source)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(mid, (3, 3), padding=1, use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype)(y)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.t_channels, (1, 1), use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype)(y)
        y = BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        trans_feat_s = nn.relu(y)
        pooled = jnp.mean(trans_feat_s, axis=(1, 2))
        return trans_feat_s, target, pooled


class Embed(nn.Module):
    """Linear + L2 norm (models/util.py:239-249) — CRD projection head."""

    dim_out: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        x = TorchLinear(self.dim_out, dtype=self.dtype)(x)
        return l2_normalize(x.astype(jnp.float32), axis=1)


class LinearEmbed(nn.Module):
    """Plain linear embed (models/util.py:252-262) — CC loss head."""

    dim_out: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        return TorchLinear(self.dim_out, dtype=self.dtype)(x)
