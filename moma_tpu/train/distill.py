"""Distillation trainer: aux-module construction + the jitted distill step.

Covers every comparison distiller the reference wires through
train_student_{moma,comparison}.py + helper/loops_moma.py:69-218:
kd, hint, attention, similarity, vid, crd, semckd, srrl, simkd, nst, rkd,
pkt, kdsvd, correlation (plus ab/fsp/ft which the reference exports but
never wires — here they are first-class).

Loss contract: total = cls*CE + div*KL + beta*loss_kd (loops_moma.py:350).

Everything — student fwd/bwd, frozen-teacher fwd, aux modules, the CRD
memory update — lives in ONE jitted step.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from moma_tpu.core import jitopt
from moma_tpu.core.config import Config
from moma_tpu.losses import functional as F
from moma_tpu.losses import aux as A
from moma_tpu.losses.crd import CRDMemory, crd_loss
from moma_tpu.train.state import DistillState

STATELESS = {"kd", "attention", "similarity", "nst", "rkd", "pkt", "kdsvd",
             "ab", "fsp", "ft"}


def probe_shapes(model, image_size: int, batch_size: int = 2):
    """Shape-probe a backbone without running it (reference probes with a
    real dummy batch, train_student_moma.py:263-277)."""
    x = jnp.zeros((batch_size, image_size, image_size, 3))
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False)
    )
    out = jax.eval_shape(
        lambda v: model.apply(
            {"params": v["params"],
             "batch_stats": v.get("batch_stats", {})},
            x, train=False,
        ),
        variables,
    )
    feats, logits = out
    return [f.shape for f in feats], logits.shape


class Distiller:
    """Bundles the method's aux Flax modules + the pure loss branch.

    aux modules are initialized into {'params':…, 'batch_stats':…} and
    joined to the student's optimizer (reference trainable_list).
    """

    def __init__(self, cfg: Config, feat_s_shapes, feat_t_shapes, n_data: int = 0,
                 batch_size: int = 0, dtype=None):
        self.cfg = cfg
        self.method = cfg.distill.distill
        self.feat_s_shapes = feat_s_shapes
        self.feat_t_shapes = feat_t_shapes
        self.n_data = n_data
        self.batch_size = batch_size or cfg.data.batch_size
        self.dtype = dtype
        self.modules: Dict[str, Any] = {}
        self._build()

    # ---------------------------------------------------------- builders
    def _build(self):
        m = self.method
        d = self.cfg.distill
        s_sh, t_sh = self.feat_s_shapes, self.feat_t_shapes
        if m == "hint":
            hs = s_sh[d.hint_layer]
            ht = t_sh[d.hint_layer]
            self.modules["convreg"] = A.ConvReg(
                s_shape=hs[1:], t_shape=ht[1:], dtype=self.dtype
            )
        elif m == "vid":
            for i, (ss, ts) in enumerate(zip(s_sh[1:-1], t_sh[1:-1])):
                self.modules[f"vid_{i}"] = A.VIDRegressor(
                    mid_channels=ts[-1], target_channels=ts[-1], dtype=self.dtype
                )
        elif m == "crd":
            self.modules["embed_s"] = A.Embed(self.cfg.moma.feat_dim)
            self.modules["embed_t"] = A.Embed(self.cfg.moma.feat_dim)
        elif m == "semckd":
            self.modules["selfa"] = A.SelfA(
                s_channels=[s[-1] for s in s_sh[1:-1]],
                t_channels=[t[-1] for t in t_sh[1:-1]],
                batch_size=self.batch_size,
                soft=d.soft,
                dtype=self.dtype,
            )
        elif m == "srrl":
            self.modules["srrl"] = A.SRRL(t_dim=t_sh[-1][-1], dtype=self.dtype)
        elif m == "simkd":
            self.modules["simkd"] = A.SimKD(
                t_channels=t_sh[-2][-1], factor=d.factor, dtype=self.dtype
            )
        elif m == "correlation":
            # reference CC embeds both sides to feat_dim (comparison driver)
            self.modules["embed_s"] = A.LinearEmbed(self.cfg.moma.feat_dim)
            self.modules["embed_t"] = A.LinearEmbed(self.cfg.moma.feat_dim)
        elif m in STATELESS:
            pass
        else:
            raise NotImplementedError(m)

    def init_aux(self, rng: jax.Array):
        """Init aux params/batch_stats with dummy inputs of probed shapes."""
        params, batch_stats = {}, {}
        s_sh, t_sh = self.feat_s_shapes, self.feat_t_shapes
        d = self.cfg.distill

        def zeros(shape):
            return jnp.zeros(shape, jnp.float32)

        for name, mod in self.modules.items():
            rng, k = jax.random.split(rng)
            if name == "convreg":
                v = mod.init(k, zeros(s_sh[d.hint_layer]), zeros(t_sh[d.hint_layer]),
                             train=False)
            elif name.startswith("vid_"):
                i = int(name.split("_")[1])
                v = mod.init(k, zeros(s_sh[1:-1][i]))
            elif name == "embed_s":
                v = mod.init(k, zeros(s_sh[-1]))
            elif name == "embed_t":
                v = mod.init(k, zeros(t_sh[-1]))
            elif name == "selfa":
                v = mod.init(
                    k,
                    [zeros(s) for s in s_sh[1:-1]],
                    [zeros(t) for t in t_sh[1:-1]],
                    train=False,
                )
            elif name == "srrl":
                v = mod.init(k, zeros(s_sh[-1]), train=False)
            elif name == "simkd":
                v = mod.init(k, zeros(s_sh[-2]), zeros(t_sh[-2]), train=False)
            else:
                raise KeyError(name)
            params[name] = v["params"]
            if "batch_stats" in v:
                batch_stats[name] = v["batch_stats"]
        return params, batch_stats

    def init_extra(self, rng: jax.Array):
        """Non-parameter distiller state (CRD memory banks)."""
        if self.method == "crd":
            assert self.n_data > 0, "CRD needs n_data"
            return CRDMemory.create(rng, self.n_data, self.cfg.moma.feat_dim)
        return None

    # ------------------------------------------------------------- loss
    def loss(
        self,
        aux_params: dict,
        aux_bs: dict,
        extra,
        feat_s: Sequence[jax.Array],
        feat_t: Sequence[jax.Array],
        logit_s: jax.Array,
        logit_t: jax.Array,
        batch: dict,
        cls_t_apply: Callable,
    ) -> Tuple[jax.Array, dict, Any, Optional[jax.Array]]:
        """Returns (loss_kd, new_aux_bs, new_extra, logits_for_metrics).

        logits_for_metrics is non-None only for simkd (the student is
        scored through the reused teacher classifier,
        loops_moma.py:184-187 / :481-487).
        """
        m = self.method
        d = self.cfg.distill
        new_bs = dict(aux_bs)
        new_extra = extra
        metric_logits = None

        def run(name, *args, train=True):
            mod = self.modules[name]
            variables = {"params": aux_params[name]}
            mutable = []
            if name in aux_bs:
                variables["batch_stats"] = aux_bs[name]
                mutable = ["batch_stats"]
            if mutable:
                out, mut = mod.apply(variables, *args, train=train, mutable=mutable)
                new_bs[name] = mut.get("batch_stats", {})
                return out
            return mod.apply(variables, *args)

        if m == "kd":
            loss_kd = jnp.asarray(0.0)
        elif m == "hint":
            f_s, f_t = run("convreg", feat_s[d.hint_layer], feat_t[d.hint_layer])
            loss_kd = F.hint_mse(f_s, f_t)
        elif m == "attention":
            loss_kd = F.attention_transfer(feat_s[1:-1], feat_t[1:-1])
        elif m == "similarity":
            loss_kd = F.similarity_preserving([feat_s[-2]], [feat_t[-2]])
        elif m == "vid":
            loss_kd = 0.0
            for i, (fs, ft) in enumerate(zip(feat_s[1:-1], feat_t[1:-1])):
                fs2, ft2 = F._match_spatial(fs, ft)
                pred_mean, log_scale = run(f"vid_{i}", fs2, train=True)
                loss_kd += F.vid_loss(pred_mean, ft2, log_scale)
        elif m == "nst":
            loss_kd = F.nst_loss(feat_s[1:-2], feat_t[1:-2])
        elif m == "rkd":
            loss_kd = F.rkd_loss(feat_s[-1], feat_t[-1])
        elif m == "pkt":
            loss_kd = F.pkt_loss(feat_s[-1], feat_t[-1])
        elif m == "kdsvd":
            loss_kd = F.kdsvd_loss(feat_s[1:-1], feat_t[1:-1])
        elif m == "correlation":
            e_s = run("embed_s", feat_s[-1])
            e_t = run("embed_t", feat_t[-1])
            loss_kd = F.cc_loss(e_s, e_t)
        elif m == "crd":
            e_s = run("embed_s", feat_s[-1])
            e_t = run("embed_t", feat_t[-1])
            loss_kd, new_extra = crd_loss(
                extra, e_s, e_t,
                batch["index"], batch["contrast_idx"],
                nce_t=self.cfg.moma.nce_t, momentum=self.cfg.moma.nce_m,
            )
        elif m == "semckd":
            s_value, f_target, weight = run(
                "selfa", feat_s[1:-1], feat_t[1:-1]
            )
            loss_kd = F.semckd_loss(s_value, f_target, weight)
        elif m == "srrl":
            trans_feat_s = run("srrl", feat_s[-1])
            pred_feat_s = cls_t_apply(trans_feat_s)
            loss_kd = F.hint_mse(trans_feat_s, feat_t[-1]) + F.hint_mse(
                pred_feat_s, logit_t
            )
        elif m == "simkd":
            trans_s, trans_t, pooled = run("simkd", feat_s[-2], feat_t[-2])
            metric_logits = cls_t_apply(pooled)
            loss_kd = F.hint_mse(trans_s, trans_t)
        elif m == "ab":
            loss_kd = F.ab_loss(feat_s[1:-1], feat_t[1:-1])
        elif m == "fsp":
            loss_kd = F.fsp_loss(feat_s[:-1], feat_t[:-1])
        elif m == "ft":
            loss_kd = F.ft_loss(
                F.ft_factor(feat_s[-2]), F.ft_factor(feat_t[-2])
            )
        else:
            raise NotImplementedError(m)
        return loss_kd, new_bs, new_extra, metric_logits


def make_classifier_apply(teacher_params) -> Callable:
    """Apply the teacher's final classifier to a pooled embedding — the
    cls_t reuse mechanism (reference get_feat_modules()[-1])."""
    cls = teacher_params["classifier"]

    def apply(x):
        y = x.astype(jnp.float32) @ cls["kernel"]
        if "bias" in cls:
            y = y + cls["bias"]
        return y

    return apply


def make_simkd_eval_step(
    student, distiller: "Distiller", teacher_params, teacher_batch_stats,
    n_cls: int, normalize_fn: Optional[Callable],
):
    """Eval step for SimKD: student features -> SimKD bottleneck (eval)
    -> pooled -> teacher classifier (loops_moma.py:481-487).

    Signature matches make_eval_step but expects the FULL distill params
    {'student','aux'} / batch_stats trees.
    """
    cls_t = make_classifier_apply(teacher_params)
    simkd_mod = distiller.modules["simkd"]
    t_feat_shape = distiller.feat_t_shapes[-2]

    @jitopt.jit
    def step(params, batch_stats, batch):
        images, labels, mask = batch["image"], batch["label"], batch["mask"]
        if normalize_fn is not None:
            images = normalize_fn(images)
        feat_s, _ = student.apply(
            {
                "params": params["student"],
                "batch_stats": batch_stats["student"],
            },
            images,
            train=False,
        )
        dummy_t = jnp.zeros((images.shape[0], *t_feat_shape[1:]), jnp.float32)
        _, _, pooled = simkd_mod.apply(
            {
                "params": params["aux"]["simkd"],
                "batch_stats": batch_stats["aux"]["simkd"],
            },
            feat_s[-2],
            dummy_t,
            train=False,
        )
        logits = cls_t(pooled)
        from moma_tpu.core.metrics import confusion_matrix

        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        m = mask.astype(jnp.float32)
        return jnp.sum(nll * m), jnp.sum(m), confusion_matrix(
            logits, labels, n_cls, mask=mask
        )

    return step


def make_distill_train_step(
    distiller: Distiller,
    augment_fn: Optional[Callable],
    donate: bool = True,
    grad_accum: int = 1,
    remat: bool = False,
):
    """jit(step(state: DistillState, batch, rng) -> (state, metrics)).

    Teacher runs frozen in eval mode (loops_moma.py:74-75); its features
    are stop-gradiented (":117 f.detach()").

    grad_accum=M > 1: lax.scan over M equal microbatches, one optimizer
    update — the activation-memory lever for big students/teachers (see
    make_vanilla_train_step).  Microbatch = virtual DDP rank: averaged
    CE/KL/feature-loss gradients equal the global-batch mean; BatchNorm
    (student + aux modules) sees per-microbatch statistics like the
    reference's unsynced per-GPU BN.  Stateful distiller extras (the CRD
    memory banks) chain through the scan — each sample's bank row is
    still written exactly once per step, so semantics match the
    sequential smaller-batch run.
    """
    cfg = distiller.cfg
    c, dv, b = cfg.distill.cls, cfg.distill.div, cfg.distill.beta
    kd_T = cfg.distill.kd_T
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")

    def microbatch_grads(state, batch_stats, extra, mb_batch, cls_t_apply):
        """(grads, aux) for one (micro)batch against FIXED params, with
        batch_stats/extra supplied by the caller (chained under scan)."""
        images, labels = mb_batch["image"], mb_batch["label"]
        feat_t, logit_t = state.teacher_apply_fn(
            {
                "params": state.teacher_params,
                "batch_stats": state.teacher_batch_stats,
            },
            images,
            train=False,
        )
        feat_t = jax.tree_util.tree_map(jax.lax.stop_gradient, feat_t)
        logit_t = jax.lax.stop_gradient(logit_t)

        def student_fwd(p, bs, im):
            return state.apply_fn(
                {"params": p, "batch_stats": bs}, im,
                train=True, mutable=["batch_stats"],
            )

        if remat:
            # recompute the student forward in the backward pass instead
            # of holding its activations (RunConfig.remat); the frozen
            # teacher forward above is gradient-free and holds none
            student_fwd = jax.checkpoint(student_fwd)

        def loss_fn(params):
            (feat_s, logit_s), mut = student_fwd(
                params["student"], batch_stats["student"], images
            )
            loss_cls = F.cross_entropy(logit_s, labels)
            loss_div = F.kd_kl(logit_s, logit_t, kd_T)
            loss_kd, new_aux_bs, new_extra, metric_logits = distiller.loss(
                params["aux"],
                batch_stats["aux"],
                extra,
                feat_s,
                feat_t,
                logit_s,
                logit_t,
                mb_batch,
                cls_t_apply,
            )
            total = c * loss_cls + dv * loss_div + b * loss_kd
            new_bs = {"student": mut.get("batch_stats", {}), "aux": new_aux_bs}
            out_logits = metric_logits if metric_logits is not None else logit_s
            return total, (loss_cls, loss_div, loss_kd, out_logits, new_bs, new_extra)

        return jax.value_and_grad(loss_fn, has_aux=True)(state.params)

    def batch_metrics(total, loss_cls, loss_div, loss_kd, logits, labels):
        return {
            "loss": total,
            "loss_cls": loss_cls,
            "loss_div": loss_div,
            "loss_kd": loss_kd,
            "acc1": jnp.mean(
                (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
            )
            * 100.0,
            "acc5": jnp.mean(
                jnp.any(
                    jax.lax.top_k(logits, min(5, logits.shape[-1]))[1]
                    == labels[:, None],
                    axis=-1,
                ).astype(jnp.float32)
            )
            * 100.0,
        }

    def step(state: DistillState, batch, rng):
        if augment_fn is not None:
            batch = dict(batch)
            batch["image"] = augment_fn(batch["image"], rng)
        cls_t_apply = make_classifier_apply(state.teacher_params)
        extra = getattr(state, "extra", None)

        if grad_accum == 1:
            (total, (loss_cls, loss_div, loss_kd, logits, new_bs, new_extra)), grads = (
                microbatch_grads(state, state.batch_stats, extra, batch, cls_t_apply)
            )
            new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
            if new_extra is not None:
                new_state = new_state.replace(extra=new_extra)
            return new_state, batch_metrics(
                total, loss_cls, loss_div, loss_kd, logits, batch["label"]
            )

        B = batch["image"].shape[0]
        if B % grad_accum != 0:
            raise ValueError(
                f"batch size {B} not divisible by grad_accum={grad_accum}"
            )
        mb = B // grad_accum
        mb_batch = {
            k: v.reshape(grad_accum, mb, *v.shape[1:]) for k, v in batch.items()
        }

        def body(carry, xs):
            bstats, ex, gsum, msum = carry
            (total, (loss_cls, loss_div, loss_kd, logits, new_bs, new_extra)), grads = (
                microbatch_grads(state, bstats, ex, xs, cls_t_apply)
            )
            gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
            m = batch_metrics(total, loss_cls, loss_div, loss_kd, logits, xs["label"])
            msum = jax.tree_util.tree_map(jnp.add, msum, m)
            next_ex = new_extra if new_extra is not None else ex
            return (new_bs, next_ex, gsum, msum), None

        zeros_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        zeros_m = {
            k: jnp.zeros((), jnp.float32)
            for k in ("loss", "loss_cls", "loss_div", "loss_kd", "acc1", "acc5")
        }
        (final_bs, final_extra, gsum, msum), _ = jax.lax.scan(
            body, (state.batch_stats, extra, zeros_g, zeros_m), mb_batch
        )
        grads = jax.tree_util.tree_map(lambda g: g / grad_accum, gsum)
        metrics = jax.tree_util.tree_map(lambda m: m / grad_accum, msum)
        new_state = state.apply_gradients(grads, new_batch_stats=final_bs)
        if final_extra is not None:
            new_state = new_state.replace(extra=final_extra)
        return new_state, metrics

    return jitopt.jit(step, donate_argnums=(0,) if donate else ())
