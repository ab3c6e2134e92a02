"""Stateless KD losses as pure jnp functions (NHWC feature maps).

Each function documents the reference module it is behaviorally equivalent
to (verified by golden-value tests in tests/test_losses_parity.py against
torch oracles).  Spatial feature maps are NHWC — the TPU-native layout —
whereas the reference is NCHW; tests transpose accordingly.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------- CE / KD

def cross_entropy(logits: Array, labels: Array, mask: Array | None = None) -> Array:
    """Mean softmax cross-entropy over valid rows (torch nn.CrossEntropyLoss)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if mask is not None:
        m = mask.astype(nll.dtype)
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(nll)


def kd_kl(logits_s: Array, logits_t: Array, T: float = 4.0) -> Array:
    """Hinton KD: T^2-scaled KL(p_t || p_s), batch-mean.

    Parity: distiller_zoo/KD.py:7-17 (KLDivLoss(batchmean) on
    log_softmax(s/T) vs softmax(t/T), times T^2).
    """
    logp_s = jax.nn.log_softmax(logits_s.astype(jnp.float32) / T, axis=-1)
    logp_t = jax.nn.log_softmax(logits_t.astype(jnp.float32) / T, axis=-1)
    p_t = jnp.exp(logp_t)
    kl = jnp.sum(p_t * (logp_t - logp_s), axis=-1)
    return jnp.mean(kl) * (T**2)


# ------------------------------------------------------------ spatial utils

def adaptive_avg_pool_nhwc(x: Array, out_h: int, out_w: int | None = None) -> Array:
    """torch F.adaptive_avg_pool2d semantics for NHWC inputs.

    Window for output index i: [floor(i*H/out), ceil((i+1)*H/out)).
    Shapes are static, so the index arithmetic happens at trace time.
    """
    if out_w is None:
        out_w = out_h
    B, H, W, C = x.shape
    if H == out_h and W == out_w:
        return x
    if H % out_h == 0 and W % out_w == 0:
        # fast path: plain window mean (reshape is free for XLA)
        x = x.reshape(B, out_h, H // out_h, out_w, W // out_w, C)
        return x.mean(axis=(2, 4))
    rows = [
        (int(jnp.floor(i * H / out_h)), int(-(-((i + 1) * H) // out_h)))
        for i in range(out_h)
    ]
    cols = [
        (int(jnp.floor(j * W / out_w)), int(-(-((j + 1) * W) // out_w)))
        for j in range(out_w)
    ]
    out_rows = []
    for (r0, r1) in rows:
        strip = x[:, r0:r1].mean(axis=1)  # (B, W, C)
        out_rows.append(
            jnp.stack([strip[:, c0:c1].mean(axis=1) for (c0, c1) in cols], axis=1)
        )
    return jnp.stack(out_rows, axis=1)


def _match_spatial(f_s: Array, f_t: Array):
    """Pool the larger map down to the smaller (reference AT.py:21-27 etc.)."""
    s_H, t_H = f_s.shape[1], f_t.shape[1]
    if s_H > t_H:
        f_s = adaptive_avg_pool_nhwc(f_s, t_H, f_t.shape[2])
    elif s_H < t_H:
        f_t = adaptive_avg_pool_nhwc(f_t, s_H, f_s.shape[2])
    return f_s, f_t


def l2_normalize(x: Array, axis: int = -1, eps: float = 1e-12) -> Array:
    """torch F.normalize: x / max(||x||, eps)."""
    n = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


# ------------------------------------------------------------------ losses

def hint_mse(f_s: Array, f_t: Array) -> Array:
    """FitNet hint loss: plain MSE (distiller_zoo/FitNet.py:6-14).

    Inputs are the ConvReg-regressed student map and the (possibly pooled)
    teacher map — see moma_tpu.losses.aux.ConvReg.
    """
    return jnp.mean((f_s.astype(jnp.float32) - f_t.astype(jnp.float32)) ** 2)


def _at_map(f: Array, p: int = 2) -> Array:
    """Attention map: L2-normalized flat mean over channels of |f|^p.

    NHWC: mean over C (axis -1), flatten HW, normalize rows.
    Parity: distiller_zoo/AT.py:29-31.
    """
    a = jnp.mean(f.astype(jnp.float32) ** p, axis=-1)  # (B,H,W)
    a = a.reshape(a.shape[0], -1)
    return l2_normalize(a, axis=-1)


def attention_transfer(g_s: Sequence[Array], g_t: Sequence[Array], p: int = 2) -> Array:
    """AT loss summed over layer pairs (loop sums the list — see
    helper/loops_moma.py usage `sum(loss_group)`).
    Parity per pair: distiller_zoo/AT.py:17-31."""
    total = 0.0
    for f_s, f_t in zip(g_s, g_t):
        f_s, f_t = _match_spatial(f_s, f_t)
        total += jnp.mean((_at_map(f_s, p) - _at_map(f_t, p)) ** 2)
    return total


def similarity_preserving(g_s: Sequence[Array], g_t: Sequence[Array]) -> Array:
    """SP loss (distiller_zoo/SP.py:8-30): row-normalized Gram matrices,
    squared diff summed / bsz^2; summed over the (single) layer pair."""
    total = 0.0
    for f_s, f_t in zip(g_s, g_t):
        b = f_s.shape[0]
        fs = f_s.astype(jnp.float32).reshape(b, -1)
        ft = f_t.astype(jnp.float32).reshape(b, -1)
        Gs = l2_normalize(fs @ fs.T, axis=1)
        Gt = l2_normalize(ft @ ft.T, axis=1)
        total += jnp.sum((Gt - Gs) ** 2) / (b * b)
    return total


def nst_loss(g_s: Sequence[Array], g_t: Sequence[Array]) -> Array:
    """NST poly-kernel MMD (distiller_zoo/NST.py:7-44, full_loss=False):
    mean(K(fs,fs)) - 2*mean(K(fs,ft)) with channels L2-normalized over HW.

    K(a,b)[i,j] = (a_i . b_j)^2 — computed as the squared Gram matrix, a
    pair of (C,HW)x(HW,C) matmuls per sample (MXU-friendly)."""
    total = 0.0
    for f_s, f_t in zip(g_s, g_t):
        f_s, f_t = _match_spatial(f_s, f_t)
        B = f_s.shape[0]
        # NHWC -> (B, C, HW), normalize over HW
        fs = jnp.transpose(f_s.astype(jnp.float32), (0, 3, 1, 2)).reshape(
            B, f_s.shape[-1], -1
        )
        ft = jnp.transpose(f_t.astype(jnp.float32), (0, 3, 1, 2)).reshape(
            B, f_t.shape[-1], -1
        )
        fs = l2_normalize(fs, axis=2)
        ft = l2_normalize(ft, axis=2)
        G_ss = jnp.einsum("bik,bjk->bij", fs, fs)
        G_st = jnp.einsum("bik,bjk->bij", fs, ft)
        total += jnp.mean(G_ss**2) - 2 * jnp.mean(G_st**2)
    return total


def _pdist(e: Array, eps: float = 1e-12) -> Array:
    """Pairwise euclidean distances with clamped squares and zero diagonal
    (distiller_zoo/RKD.py:48-58)."""
    sq = jnp.sum(e * e, axis=1)
    prod = e @ e.T
    d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2 * prod, eps)
    d = jnp.sqrt(d2)
    return d * (1.0 - jnp.eye(e.shape[0], dtype=d.dtype))


def _smooth_l1(x: Array, y: Array) -> Array:
    diff = jnp.abs(x - y)
    return jnp.mean(jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5))


def rkd_loss(f_s: Array, f_t: Array, w_d: float = 25.0, w_a: float = 50.0) -> Array:
    """Relational KD: distance + angle terms (distiller_zoo/RKD.py:8-46)."""
    B = f_s.shape[0]
    s = f_s.astype(jnp.float32).reshape(B, -1)
    t = f_t.astype(jnp.float32).reshape(B, -1)

    t_d = jax.lax.stop_gradient(_pdist(t))
    t_d = t_d / (jnp.sum(t_d) / jnp.maximum(jnp.sum(t_d > 0), 1))
    s_d = _pdist(s)
    s_d = s_d / (jnp.sum(s_d) / jnp.maximum(jnp.sum(s_d > 0), 1))
    loss_d = _smooth_l1(s_d, t_d)

    def angles(e):
        diff = e[None, :, :] - e[:, None, :]  # (B,B,D)
        # grad-safe normalize: the i==j rows are exactly zero and jax's
        # sqrt has an inf gradient at 0 (torch defines it as 0)
        nd = diff * jax.lax.rsqrt(jnp.sum(diff * diff, axis=2, keepdims=True) + 1e-24)
        return jnp.einsum("ijd,ikd->ijk", nd, nd).reshape(-1)

    t_a = jax.lax.stop_gradient(angles(t))
    s_a = angles(s)
    loss_a = _smooth_l1(s_a, t_a)
    return w_d * loss_d + w_a * loss_a


def pkt_loss(f_s: Array, f_t: Array, eps: float = 1e-7) -> Array:
    """Probabilistic knowledge transfer (distiller_zoo/PKT.py:18-44)."""
    B = f_s.shape[0]
    s = f_s.astype(jnp.float32).reshape(B, -1)
    t = f_t.astype(jnp.float32).reshape(B, -1)
    s = s / (jnp.linalg.norm(s, axis=1, keepdims=True) + eps)
    t = t / (jnp.linalg.norm(t, axis=1, keepdims=True) + eps)
    s = jnp.nan_to_num(s)
    t = jnp.nan_to_num(t)
    sim_s = (s @ s.T + 1.0) / 2.0
    sim_t = (t @ t.T + 1.0) / 2.0
    sim_s = sim_s / jnp.sum(sim_s, axis=1, keepdims=True)
    sim_t = sim_t / jnp.sum(sim_t, axis=1, keepdims=True)
    return jnp.mean(sim_t * jnp.log((sim_t + eps) / (sim_s + eps)))


def cc_loss(e_s: Array, e_t: Array) -> Array:
    """Correlation congruence over LinearEmbed outputs
    (distiller_zoo/CC.py:7-18): consecutive-row product of |e_s - e_t|."""
    delta = jnp.abs(e_s.astype(jnp.float32) - e_t.astype(jnp.float32))
    return jnp.mean(jnp.sum(delta[:-1] * delta[1:], axis=1))


def fsp_loss(g_s: Sequence[Array], g_t: Sequence[Array]) -> Array:
    """FSP-matrix distillation (distiller_zoo/FSP.py:8-48), summed pairs."""

    def fsp_mats(g):
        mats = []
        for bot, top in zip(g[:-1], g[1:]):
            bot, top = _match_spatial(bot, top)
            B = bot.shape[0]
            bo = bot.astype(jnp.float32).reshape(B, -1, bot.shape[-1])  # (B,HW,Cb)
            to = top.astype(jnp.float32).reshape(B, -1, top.shape[-1])  # (B,HW,Ct)
            mats.append(jnp.einsum("bhi,bhj->bij", to, bo) / bo.shape[1])  # (B,Ct,Cb)
        return mats

    total = 0.0
    for s, t in zip(fsp_mats(g_s), fsp_mats(g_t)):
        total += jnp.mean((s - t) ** 2)
    return total


def ft_loss(factor_s: Array, factor_t: Array, p2: int = 1) -> Array:
    """Factor transfer comparison (distiller_zoo/FT.py:7-31) over factor
    maps; factors here are the normalized channel-mean maps."""
    d = factor_s - factor_t
    if p2 == 1:
        return jnp.mean(jnp.abs(d))
    return jnp.mean(d**p2)


def ft_factor(f: Array, p1: int = 2) -> Array:
    """FT 'factor': L2-normalized flat channel-mean of f^p1 (FT.py:30-31)."""
    return _at_map(f, p1)


def ab_loss(g_s: Sequence[Array], g_t: Sequence[Array], margin: float = 1.0) -> Array:
    """Activation-boundary loss (distiller_zoo/AB.py:7-29), weighted sum."""
    n = len(g_s)
    total = 0.0
    bsz = g_s[0].shape[0]
    for i, (s, t) in enumerate(zip(g_s, g_t)):
        s = s.astype(jnp.float32)
        t = t.astype(jnp.float32)
        l = (s + margin) ** 2 * ((s > -margin) & (t <= 0)).astype(jnp.float32) + (
            s - margin
        ) ** 2 * ((s <= margin) & (t > 0)).astype(jnp.float32)
        w = 2.0 ** (i - n + 1)
        total += w * jnp.abs(l).sum() / bsz / 1000.0 * 3.0
    return total


def kdsvd_loss(g_s: Sequence[Array], g_t: Sequence[Array], k: int = 1) -> Array:
    """SVD-subspace RBF distillation (distiller_zoo/KDSVD.py:8-75).

    torch.svd on (B, HW, C) becomes jnp.linalg.svd; right-singular vectors
    are sign-aligned via the max-|cos| mask, truncated (k student / k+3
    teacher... reference uses k for teacher, k+3 for student), scaled by
    teacher singular values, and consecutive layers compared through an
    RBF gram.  XLA SVD runs on device; acceptable because KDSVD uses the
    tiny pre-pool maps.
    """

    def svd_vs(feat, n):
        B, H, W, C = feat.shape
        x = feat.astype(jnp.float32).reshape(B, H * W, C)
        u, s, vt = jnp.linalg.svd(x, full_matrices=False)
        v = jnp.swapaxes(vt, -2, -1)  # (B, C, min)
        u = jnp.nan_to_num(u)
        s = jnp.nan_to_num(s)
        v = jnp.nan_to_num(v)
        if n > 0:
            u = l2_normalize(u[:, :, :n], axis=1)
            s = l2_normalize(s[:, :n], axis=1)
            v = l2_normalize(v[:, :, :n], axis=1)
        return u, s, v

    def align(a, b):
        cos = jnp.einsum("bij,bik->bjk", a, b)
        max_abs = jnp.max(jnp.abs(cos), axis=1, keepdims=True)
        mask = jnp.where(jnp.abs(cos) == max_abs, jnp.sign(cos), 0.0)
        return jnp.einsum("bij,bjk->bik", a, mask)

    losses = []
    v_sb = v_tb = None
    for i, (f_s, f_t) in enumerate(zip(g_s, g_t)):
        _, s_t, v_t = svd_vs(f_t, k)
        _, _, v_s = svd_vs(f_s, k + 3)
        v_s = align(v_s, v_t)
        v_t = v_t * s_t[:, None, :]
        v_s = v_s * s_t[:, None, :]
        if i > 0:
            s_rbf = jnp.exp(-((v_s[:, :, None, :] - v_sb[:, None, :, :]) ** 2) / 8)
            t_rbf = jnp.exp(-((v_t[:, :, None, :] - v_tb[:, None, :, :]) ** 2) / 8)
            l2 = (s_rbf - jax.lax.stop_gradient(t_rbf)) ** 2
            l2 = jnp.where(jnp.isfinite(l2), l2, 0.0)
            losses.append(l2.sum())
        v_sb, v_tb = v_s, v_t
    bsz = g_s[0].shape[0]
    return sum(l / bsz for l in losses)


def vid_loss(pred_mean: Array, target: Array, log_scale: Array, eps: float = 1e-5) -> Array:
    """VID negative log-prob given the regressor output (VID.py:38-54).

    log_scale is the per-channel trainable parameter; pred_var =
    softplus(log_scale) + eps.  NHWC: channel broadcast on the last axis.
    """
    pred_var = jnp.log1p(jnp.exp(log_scale)) + eps
    pred_var = pred_var.reshape(1, 1, 1, -1)
    neg_log_prob = 0.5 * (
        (pred_mean - target) ** 2 / pred_var + jnp.log(pred_var)
    )
    return jnp.mean(neg_log_prob)


def semckd_loss(s_value, f_target, weight: Array) -> Array:
    """SemCKD attention-weighted pairwise MSE (distiller_zoo/SemCKD.py:8-22).

    s_value/f_target: [num_stu][num_tea] lists of NHWC maps; weight (B,S,T).
    """
    bsz, num_stu, num_tea = weight.shape
    rows = []
    for i in range(num_stu):
        cols = []
        for j in range(num_tea):
            d = (s_value[i][j].astype(jnp.float32) - f_target[i][j].astype(jnp.float32)) ** 2
            cols.append(d.reshape(bsz, -1).mean(axis=-1))
        rows.append(jnp.stack(cols, axis=-1))
    ind_loss = jnp.stack(rows, axis=1)  # (B, S, T)
    return jnp.sum(weight * ind_loss) / (1.0 * bsz * num_stu)
