"""MoMA training — the paper's method, as ONE jitted step.

Functional mirror of helper/loops_moma.py:244-372 ('moma' branch) +
learning/contrast_trainer.py, with the reference's in-place mutations made
explicit state transitions.  Per-step ordering (parity-critical,
SURVEY.md §7 hard part 1):

  1. student fwd (train)                      -> feat_s, logit_s
  2. teacher fwd (PRE-EMA params)             -> feat_t, logit_t  [KL uses these]
     BN mode per cfg.moma.kl_teacher_bn: 'exact' (default) = the
     reference's REAL schedule — eval-BN on each epoch's first batch
     (the per-epoch model_t.eval() reset, loops:224-227), train-BN
     after; run_moma builds both programs and dispatches per batch.
     'train' = the within-epoch steady state only (set_bn_train
     persists until the next epoch's reset — batch stats from step 2
     of each epoch on, stats mutated before the key forward); 'eval' =
     running stats always (the first-step-of-each-epoch behavior).
     'train'/'eval' each deviate from the reference on one step per
     epoch (documented in PARITY.md, numerically negligible)
  3. EMA: teacher <- alpha*teacher + (1-alpha)*student    (loops:310)
     and embed_t <- EMA(embed_s) when head=='mlp'         (loops:312-315)
  4. key forward through the POST-EMA teacher with BN in TRAIN mode
     (loops:317-320) on a shuffled global batch (Shuffle-BN), through
     embed_t (eval), then unshuffled                       (contrast_trainer:90-133)
  5. q = embed_s(feat_s[-1]); attn='self': q,k,all_k through
     atts_q/atts_k/atts_queue                              (loops:328-333)
  6. queue logits from the PRE-update memory; enqueue all_k; ptr += |all_k|
  7. loss = cls*CE + div*KL + beta*CE(contrast logits, 0)

Two execution modes (cfg.run.bn; see make_moma_train_step docstring):

bn='global' (default, TPU-idiomatic): one jitted step over the data-
sharded global batch — the reference's NCCL choreography collapses:
  - `all_k = all_gather(k)` -> all_k IS k (the global batch)
  - `broadcast(shuffle idx)` -> one shared PRNG permutation
  - `broadcast_memory`       -> queue init is deterministic & replicated
BN sees the full batch (implicit sync-BN); Shuffle-BN is an exactness
no-op here.

bn='local'/'sync' (shard_map over 'data'): the SAME step body runs per
device on its batch shard, exactly one of the reference's DDP ranks —
per-device BN statistics ('local'; 'sync' pmeans them), gradients
pmean'd like DDP's all-reduce, and Shuffle-BN (all_gather images ->
shared perm -> per-device momentum forward -> all_gather keys ->
unshuffle) is the real batch-leakage defense of
contrast_trainer.py:90-133.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from moma_tpu.core.checkpoint import CheckpointManager, StatsWriter
from moma_tpu.core import jitopt
from moma_tpu.core.config import Config
from moma_tpu.core.mesh import (DATA_AXIS, MODEL_AXIS, create_mesh,
                                replicated_sharding)
from moma_tpu.core.schedules import lr_schedule
from moma_tpu.data.pipeline import Loader
from moma_tpu.losses import functional as F
from moma_tpu.models import create_model
from moma_tpu.moma.cmo import CMOHeads
from moma_tpu.moma.queue import (
    QueueState,
    contrast_ce,
    step_moco,
    step_moco_att,
    step_moco_att_sharded,
    step_moco_sharded,
    step_moco_sstt,
    step_moco_sstt_sharded,
    step_moco_st,
    step_moco_st_sharded,
)
from moma_tpu.train.distill import probe_shapes
from moma_tpu.train.loop import evaluate, train_one_epoch
from moma_tpu.train.state import MomaState, make_sgd
from moma_tpu.train.steps import make_eval_step
from moma_tpu.train.teacher import augment_fns, build_datasets


def ema_update(old, new, alpha: float):
    """p_ema <- alpha*p_ema + (1-alpha)*p  (contrast_trainer.py:207-211)."""
    return jax.tree_util.tree_map(
        lambda o, n: alpha * o + (1.0 - alpha) * jax.lax.stop_gradient(
            n.astype(o.dtype)
        ),
        old,
        new,
    )


class _Replicated:
    """Identity collectives — the jit global-batch execution path, where
    the whole batch is visible and BN statistics are global (sync-BN)."""

    axis = None

    def gather(self, x):
        return x

    def pmean(self, t):
        return t

    def local_slice(self, full, local_n):
        return full


class _DataAxis:
    """Per-device collectives for the shard_map execution path (bn='local'
    / 'sync'): the body sees its LOCAL batch shard, exactly like one of
    the reference's DDP ranks (learning/contrast_trainer.py)."""

    axis = DATA_AXIS

    def gather(self, x):
        # NCCL all_gather+cat (contrast_trainer.py:83-88) over ICI
        return jax.lax.all_gather(x, DATA_AXIS, axis=0, tiled=True)

    def pmean(self, t):
        # DDP's gradient all-reduce-average / metric reduction
        return jax.tree_util.tree_map(
            lambda v: jax.lax.pmean(v, DATA_AXIS), t
        )

    def local_slice(self, full, local_n):
        i = jax.lax.axis_index(DATA_AXIS)
        return jax.lax.dynamic_slice_in_dim(full, i * local_n, local_n, 0)


def _teacher_apply(cfg: Config, teacher):
    """The step's teacher_apply_fn, honoring cfg.moma.teacher_quant
    (shared validator: core/quantize.py::teacher_apply_for)."""
    from moma_tpu.core.quantize import teacher_apply_for

    return teacher_apply_for(
        teacher.apply,
        getattr(cfg.moma, "teacher_quant", "none"),
        fused_conflict=getattr(cfg.moma, "fused_teacher", "off") == "on",
    )


def make_moma_train_step(
    cfg: Config,
    heads: CMOHeads,
    augment_fn: Optional[Callable],
    donate: bool = True,
    cross_arch: bool = False,
    mesh=None,
    kl_train_bn_override: Optional[bool] = None,
):
    """cross_arch=False: the paper's mode — the pretrained teacher IS the
    momentum encoder (EMA'd from the student; requires identical archs).

    cross_arch=True: CMO_EmaTec mode (criterion_moco_att.py:344-419) for
    mismatched architectures (e.g. ViT teacher, CNN student): the momentum
    encoder is an EMA COPY of the student (state.ema_params, key head
    'embed_ema'); the FIXED teacher contributes KL logits and — for the
    dual-bank MoCoST/SSTT memories — its own keys through 'embed_t'.

    BN execution mode (cfg.run.bn; requires `mesh` for 'local'/'sync'):
      'global' (default): one jitted global-batch step — every BatchNorm
        sees the full batch (implicit sync-BN; the TPU-idiomatic mode).
      'local': shard_map over the 'data' axis — the body runs per device
        on its batch shard like one of the reference's DDP ranks, BN
        statistics are PER-DEVICE (contrast_trainer.py's world), and the
        Shuffle-BN permutation is the real leakage defense it was built
        to be (contrast_trainer.py:90-133).  Gradients/metrics pmean over
        'data' (== DDP all-reduce-average); running BN stats are pmean'd
        at step end (deviation: the reference keeps per-rank stats and
        saves rank 0's — averaging commutes with the linear EMA write, so
        ours equals the mean of the reference's per-rank stats).
      'sync': shard_map like 'local' but BN stats pmean over 'data'
        (explicit sync-BN) — numerically the global-batch semantics with
        per-device execution; exists to price BN collectives (BASELINE.md).
    """
    c, dv, b = cfg.distill.cls, cfg.distill.div, cfg.distill.beta
    kd_T = cfg.distill.kd_T
    alpha = cfg.moma.alpha
    nce_t = cfg.moma.nce_t
    mem = cfg.moma.mem
    # self_viz trains exactly as 'self' (same module set/params;
    # the viz map is an eval-time output — cmo.py ATTN_SETS note)
    attn = "self" if cfg.moma.attn == "self_viz" else cfg.moma.attn
    shuffle_bn = cfg.moma.shuffle_bn
    # fast_teacher reuses the momentum-ENCODER key forward's logits for
    # KL; in cross-arch mode the KL teacher is a DIFFERENT model than the
    # momentum encoder, so the reuse is meaningless — fall back to the
    # real teacher forward instead of tracing with logit_t=None
    fast_teacher = (
        getattr(cfg.moma, "fast_teacher", False) and not cross_arch
    )

    # recompute-style fused Pallas forward for the gradient-free teacher
    # passes (ops/fused_effnet.py).  Opt-in only: measured SLOWER than
    # XLA's forward on v5e (40 vs 24.5 ms — the in-kernel depthwise costs
    # ~2x XLA's fused MACs, eating the expand-materialization savings;
    # numbers in BASELINE.md).  Kept as a correct, tested base for a
    # future custom-VJP student path.
    ft_mode = getattr(cfg.moma, "fused_teacher", "off")
    use_fused_teacher = (
        not cross_arch
        and ft_mode == "on"
        and cfg.model_t.name.startswith("effiB")
    )
    ft_variant = "b" + cfg.model_t.name[len("effiB"):] if use_fused_teacher else None

    # kl_teacher_bn: 'train' = steady state, 'eval' = running stats,
    # 'exact' = the reference's REAL schedule (eval on the first step of
    # each epoch — the per-epoch model_t.eval() reset, loops:224-227 —
    # train after): run_moma builds TWO jitted steps and dispatches per
    # batch; kl_train_bn_override selects which one this build is.
    kl_bn_mode = getattr(cfg.moma, "kl_teacher_bn", "train")
    if kl_bn_mode not in ("train", "eval", "exact"):
        raise ValueError(f"unknown kl_teacher_bn {kl_bn_mode!r}")
    if kl_train_bn_override is not None:
        kl_train_bn = bool(kl_train_bn_override)
    elif kl_bn_mode == "exact":
        # 'exact' is an EPOCH-LOOP schedule (eval-BN on each epoch's
        # first batch, train-BN after); a bare step has no epoch
        # structure, so a direct build IS the steady-state program —
        # HLO-identical to 'train' (scripts/kl_exact_cost.py).  run_moma
        # builds both programs via kl_train_bn_override and dispatches.
        # Callers driving their own epoch loop must do the same; warn
        # once so a bare build is a visible choice, not a silent one.
        import warnings
        warnings.warn(
            "kl_teacher_bn='exact' on a bare make_moma_train_step builds "
            "the steady-state (train-BN) program only; the first-batch "
            "eval-BN semantics needs a second build with "
            "kl_train_bn_override=False dispatched on each epoch's first "
            "batch (as run_moma does)", stacklevel=2)
        kl_train_bn = True
    else:
        kl_train_bn = kl_bn_mode == "train"

    if getattr(cfg.run, "grad_accum", 1) > 1:
        # Microbatch = virtual DDP rank (contrast_trainer's world): all
        # ranks' same-step keys (all_k, contrast_trainer.py:83-88) are
        # computed FIRST in a gradient-free scan (no activations held),
        # then the student grads accumulate per microbatch against the
        # full all_k and the pre-update queue — the reference's M-rank
        # step, sequentially.  See _make_moma_accum_step.
        if getattr(cfg.run, "bn", "global") != "global":
            raise ValueError(
                "--grad_accum with --bn local/sync would nest two rank "
                "semantics (microbatches ARE the virtual DDP ranks); use "
                "bn='global' with grad_accum, or bn='local' alone")
        if use_fused_teacher:
            raise ValueError("--grad_accum does not compose with "
                             "fused_teacher (single-chip jit optimization)")
        if fast_teacher:
            raise ValueError("--grad_accum does not compose with "
                             "fast_teacher (per-rank KL/key forwards are "
                             "distinct passes in the accumulated step)")
        return _make_moma_accum_step(
            cfg, heads, augment_fn, donate=donate, cross_arch=cross_arch,
            kl_train_bn=kl_train_bn, M=int(cfg.run.grad_accum),
        )
    bn_mode = getattr(cfg.run, "bn", "global")
    if bn_mode not in ("global", "local", "sync"):
        raise ValueError(f"unknown bn mode {bn_mode!r}")
    if bn_mode != "global" and mesh is None:
        raise ValueError(f"bn='{bn_mode}' needs the mesh passed to "
                         "make_moma_train_step")
    if bn_mode != "global" and use_fused_teacher:
        raise ValueError("fused_teacher is a single-chip jit-path "
                         "optimization; use bn='global'")
    dist = _DataAxis() if bn_mode != "global" else _Replicated()
    # bn='local'/'sync' x --model_parallel: the 2-D composition a real
    # multi-chip deployment wants (reference-faithful per-device BN x the
    # 'model'-sharded negative bank).  Inside shard_map the GSPMD path's
    # automatic sharded-operand handling is gone, so the MoCo contrast
    # runs the explicit-collective variants (queue.py step_moco_sharded).
    queue_sharded = (
        bn_mode != "global"
        and mesh is not None
        and mesh.shape.get(MODEL_AXIS, 1) > 1
    )
    # Every mem variant composes with the sharded bank (round 4): MoCo
    # via step_moco_sharded, the dual banks via step_moco_{st,sstt}_
    # sharded (both banks ride 'model'), and MoCoAtt via
    # step_moco_att_sharded (round 5: queue-consuming attention modes
    # ride ring flash attention — ops/ring_attention.py — so the full
    # bank is never materialized; qk/self_qk/self_qkv2/dual2 never need
    # it).  Parity: tests/test_moma_local_bn_mp{,_variants}.py.

    def step(state: MomaState, batch, rng):
        images = batch["image"]
        if augment_fn is not None:
            rng, k_aug = jax.random.split(rng)
            if dist.axis is not None:
                # decorrelate augmentation across device shards (each DDP
                # worker draws its own augment randomness in the reference)
                k_aug = jax.random.fold_in(
                    k_aug, jax.lax.axis_index(dist.axis)
                )
            images = augment_fn(images, k_aug)
        labels = batch["label"]

        # ---- teacher KL forward FIRST (pre-EMA params, loops:268-272).
        # kl_train_bn=True reproduces the reference's within-epoch
        # steady state: set_bn_train(model_t) persists until the next
        # epoch's model_t.eval() reset (loops:224-227,314-318), so its
        # KL forward runs with batch statistics from step 2 of each
        # epoch on, and its stats mutation lands BEFORE the key
        # forward's.  kl_train_bn=False = running stats (the reference's
        # behavior on the FIRST step of each epoch).  The default
        # kl_teacher_bn='exact' schedule dispatches between the two per
        # batch (run_moma); see PARITY.md.
        # cross-arch: the FIXED teacher stays a frozen eval-mode scorer.
        teacher_bs_kl = state.teacher_batch_stats
        feat_t = logit_t = None
        if not fast_teacher:
            if use_fused_teacher:
                from moma_tpu.ops import fused_effnet as FE
                from moma_tpu.ops.fused_effnet_pallas import fused_forward

                fe_params_t, fe_specs_t = FE.extract_params(
                    {
                        "params": state.teacher_params,
                        "batch_stats": state.teacher_batch_stats,
                    },
                    variant=ft_variant,
                )
                _pooled_t, logit_t, _coll = fused_forward(
                    fe_params_t, fe_specs_t, images, train=kl_train_bn,
                )
                feat_t = (_pooled_t,)
                if kl_train_bn:
                    teacher_bs_kl = FE.updated_batch_stats(
                        state.teacher_batch_stats, fe_specs_t, _coll
                    )
            elif cross_arch:
                feat_t, logit_t = state.teacher_apply_fn(
                    {
                        "params": state.teacher_params,
                        "batch_stats": state.teacher_batch_stats,
                    },
                    images,
                    train=False,
                )
            elif kl_train_bn:
                (feat_t, logit_t), t_mut = state.teacher_apply_fn(
                    {
                        "params": state.teacher_params,
                        "batch_stats": state.teacher_batch_stats,
                    },
                    images,
                    train=True,
                    mutable=["batch_stats"],
                )
                teacher_bs_kl = t_mut.get("batch_stats", {})
            else:
                feat_t, logit_t = state.teacher_apply_fn(
                    {
                        "params": state.teacher_params,
                        "batch_stats": state.teacher_batch_stats,
                    },
                    images,
                    train=False,
                )
            logit_t = jax.lax.stop_gradient(logit_t)

        # ---- EMA (pre-step student params; reference order loops:310)
        cmo_params = dict(state.params["cmo"])
        key_head = "embed_ema" if cross_arch else "embed_t"
        if cross_arch:
            new_momentum_params = ema_update(
                state.ema_params, state.params["student"], alpha
            )
        else:
            new_momentum_params = ema_update(
                state.teacher_params, state.params["student"], alpha
            )
        # reference EMAs embed_t only for the mlp head (loops:311-315);
        # for 'linear'/'None' both embeds stay out of the optimizer there
        if cfg.moma.head in ("mlp", "mlp_byol"):
            cmo_params_key_head = ema_update(
                cmo_params[key_head], state.params["cmo"]["embed_s"], alpha
            )
        else:
            cmo_params_key_head = cmo_params[key_head]

        # ---- keys: shuffled GLOBAL batch through the post-EMA momentum
        # encoder with BN in train mode (loops:317).  Per-device path
        # (bn='local'/'sync') mirrors contrast_trainer._shuffle_bn:90-133:
        # all_gather images -> one shared permutation (the broadcast-from-
        # rank-0 replacement: the replicated rng IS the shared draw) ->
        # each device forwards ITS slice of the permuted global batch ->
        # all_gather keys -> unshuffle.  With per-device BN stats the
        # permutation breaks the batch-composition leakage; on the jit
        # path (global BN) it is an exactness no-op, as documented.
        B_local = images.shape[0]
        if shuffle_bn:
            all_images = dist.gather(images)
            Bg = all_images.shape[0]
            if "shuffle_perm" in batch:
                perm = batch["shuffle_perm"]  # test/parity hook
            else:
                rng, k_perm = jax.random.split(rng)
                perm = jax.random.permutation(k_perm, Bg)
            inv = jnp.argsort(perm)
            # gather only THIS device's permuted rows — indexing by the
            # local slice of perm avoids materializing the full permuted
            # global batch per device (at BS1024@512px that copy is
            # ~0.8 GB/device of pure waste before the slice)
            key_images = all_images[dist.local_slice(perm, B_local)]
        else:
            key_images = images
        if cross_arch:
            (feat_key, logit_key), m_mut = state.apply_fn(
                {
                    "params": new_momentum_params,
                    "batch_stats": state.ema_batch_stats,
                },
                key_images,
                train=True,
                mutable=["batch_stats"],
            )
            new_momentum_bs = m_mut.get("batch_stats", {})
        elif use_fused_teacher:
            from moma_tpu.ops import fused_effnet as FE
            from moma_tpu.ops.fused_effnet_pallas import fused_forward

            fe_params, fe_specs = FE.extract_params(
                {
                    "params": new_momentum_params,
                    "batch_stats": teacher_bs_kl,
                },
                variant=ft_variant,
            )
            pooled_key, logit_key, collected = fused_forward(
                fe_params, fe_specs, key_images, train=True,
            )
            feat_key = (pooled_key,)
            new_momentum_bs = FE.updated_batch_stats(
                teacher_bs_kl, fe_specs, collected
            )
        else:
            # stats chain from the KL forward's mutation (reference order:
            # its train-mode KL fwd updates running stats before the keys)
            (feat_key, logit_key), m_mut = state.teacher_apply_fn(
                {
                    "params": new_momentum_params,
                    "batch_stats": teacher_bs_kl,
                },
                key_images,
                train=True,
                mutable=["batch_stats"],
            )
            new_momentum_bs = m_mut.get("batch_stats", {})
        k_emb, _ = heads.embed(
            key_head,
            {**cmo_params, key_head: cmo_params_key_head},
            state.batch_stats["cmo"],
            feat_key[-1],
            train=False,  # momentum head in eval mode (loops:313)
        )
        k_emb = jax.lax.stop_gradient(k_emb)
        if shuffle_bn:
            # gather keys globally, undo the shuffle, keep the local rows
            # (contrast_trainer.py:124-131: k = own slice, all_k = world)
            all_k = dist.gather(k_emb)[inv]
            k_emb = dist.local_slice(all_k, B_local)
        else:
            all_k = dist.gather(k_emb)

        # fast_teacher (opt-in, same-arch only): reuse the key forward's
        # logits for KL — 1 teacher fwd/step instead of 2 (~25% faster);
        # KL then sees post-EMA params + train-mode BN (deviation).
        if fast_teacher:
            if shuffle_bn:
                logit_t = dist.local_slice(
                    dist.gather(logit_key)[inv], B_local
                )
            else:
                logit_t = logit_key
            logit_t = jax.lax.stop_gradient(logit_t)
            feat_t = None
        kt_emb = None
        if cross_arch and mem in ("MoCoST", "MoCoSSTT"):
            # teacher-side keys for the dual bank (embed_t over the FIXED
            # teacher's pooled features; gradient-free like all keys)
            kt_emb, _ = heads.embed(
                "embed_t", cmo_params, state.batch_stats["cmo"],
                jax.lax.stop_gradient(feat_t[-1]), train=False,
            )
            kt_emb = jax.lax.stop_gradient(kt_emb)

        # MoCoSSTT dual query: q_t is the student's query on a SECOND
        # augmented view (the 'q_jig' lineage of mem_moco.py:224 — Py-
        # Contrast's jigsaw view; the reference never wires a q_t source).
        # Gradient flows through the second forward like the first.
        images2 = None
        if mem == "MoCoSSTT":
            if augment_fn is not None:
                rng, k_aug2 = jax.random.split(rng)
                if dist.axis is not None:
                    k_aug2 = jax.random.fold_in(
                        k_aug2, jax.lax.axis_index(dist.axis)
                    )
                images2 = augment_fn(batch["image"], k_aug2)
            else:
                images2 = images

        def student_fwd(p, bs, im):
            return state.apply_fn(
                {"params": p, "batch_stats": bs}, im,
                train=True, mutable=["batch_stats"],
            )

        if getattr(cfg.run, "remat", False):
            # recompute the student forward(s) in the backward pass
            # instead of holding activations (RunConfig.remat); all
            # teacher/momentum-encoder forwards are gradient-free
            student_fwd = jax.checkpoint(student_fwd)

        def loss_fn(params):
            (feat_s, logit_s), mut = student_fwd(
                params["student"], state.batch_stats["student"], images
            )
            loss_cls = F.cross_entropy(logit_s, labels)
            loss_div = F.kd_kl(logit_s, logit_t, kd_T)

            q, new_embed_s_bs = heads.embed(
                "embed_s", params["cmo"], state.batch_stats["cmo"],
                feat_s[-1], train=True,
            )
            attn_fns = heads.attn_fns(params["cmo"])
            k_local, keys_for_queue = k_emb, all_k
            if mem == "MoCoAtt":
                if queue_sharded:
                    # queue-consuming attention modes ride the ring path
                    # (ops/ring_attention.py): the bank — raw or
                    # transformed — is never gathered; shards circulate
                    # over 'model' and the transformed rows stay sharded
                    # into sharded_queue_logits_t.
                    logits, new_queue = step_moco_att_sharded(
                        state.queue, q, k_local, keys_for_queue, nce_t,
                        attn, attn_fns, MODEL_AXIS,
                        ring_fns=heads.ring_attn_fns(params["cmo"],
                                                     MODEL_AXIS),
                    )
                else:
                    logits, new_queue = step_moco_att(
                        state.queue, q, k_local, keys_for_queue, nce_t,
                        attn, attn_fns,
                    )
                logits_list = [logits]
            elif mem in ("MoCoST", "MoCoSSTT"):
                # dual-bank variant: momentum-encoder keys fill memory_s;
                # cross-arch mode adds the fixed teacher's keys to memory_t
                q_in, k_in = q, k_local
                kt_in = kt_emb if kt_emb is not None else k_local
                if attn == "self" and attn_fns:
                    q_in = attn_fns["atts_q"](q_in)
                    k_in = attn_fns["atts_k"](k_in)
                # enqueue the GLOBAL gathered keys (post-attention: atts_k
                # mixes only within a device's rows, like the reference's
                # per-rank batch-token attention)
                all_k_in = dist.gather(k_in)
                all_kt_in = dist.gather(kt_in)
                if mem == "MoCoSSTT":
                    # dual query: second-view student embedding (q_jig slot
                    # of mem_moco.py:219-253) -> 4 logit sets ss/st/ts/tt
                    # view-2 stats discarded (mutable handled in student_fwd)
                    (feat_s2, _), _ = student_fwd(
                        params["student"], state.batch_stats["student"],
                        images2,
                    )
                    qt_in, _ = heads.embed(
                        "embed_s", params["cmo"], state.batch_stats["cmo"],
                        feat_s2[-1], train=True,
                    )
                    if attn == "self" and attn_fns:
                        qt_in = attn_fns["atts_q"](qt_in)
                    if queue_sharded:
                        logits_ss, logits_st, logits_ts, logits_tt, \
                            new_queue = step_moco_sstt_sharded(
                                state.queue, q_in, k_in, qt_in, kt_in,
                                all_k_in, all_kt_in, nce_t, MODEL_AXIS,
                            )
                    else:
                        logits_ss, logits_st, logits_ts, logits_tt, \
                            new_queue = step_moco_sstt(
                                state.queue, q_in, k_in, qt_in, kt_in,
                                all_k_in, all_kt_in, nce_t,
                            )
                    logits = logits_ss
                    logits_list = [logits_ss, logits_st, logits_ts, logits_tt]
                else:
                    if queue_sharded:
                        logits_ss, logits_st, new_queue = step_moco_st_sharded(
                            state.queue, q_in, k_in, kt_in,
                            all_k_in, all_kt_in, nce_t, MODEL_AXIS,
                        )
                    else:
                        logits_ss, logits_st, new_queue = step_moco_st(
                            state.queue, q_in, k_in, kt_in,
                            all_k_in, all_kt_in, nce_t,
                        )
                    # ST keeps round-1 semantics: loss on the first logit
                    # set (the loop's single-logits contract, loops:334)
                    logits = logits_ss
                    logits_list = [logits_ss]
            else:  # MoCo
                q_in, k_in, keys_in = q, k_local, keys_for_queue
                if attn == "self" and attn_fns:
                    # atts_queue transforms the keys ENTERING the queue, not
                    # the queue memory (loops:328-333)
                    q_in = attn_fns["atts_q"](q_in)
                    k_in = attn_fns["atts_k"](k_in)
                    keys_in = attn_fns["atts_queue"](keys_in)
                if queue_sharded:
                    logits, new_queue = step_moco_sharded(
                        state.queue, q_in, k_in, keys_in, nce_t, MODEL_AXIS
                    )
                else:
                    logits, new_queue = step_moco(
                        state.queue, q_in, k_in, keys_in, nce_t
                    )
                logits_list = [logits]
            # SSTT: mean CE over the 4 sets (each is a (K+1)-way contrast
            # with the positive at column 0); others: single-set CE
            loss_kd = sum(contrast_ce(lg) for lg in logits_list) / len(
                logits_list
            )
            total = c * loss_cls + dv * loss_div + b * loss_kd
            new_bs = {
                "student": mut.get("batch_stats", {}),
                "cmo": (
                    {**state.batch_stats["cmo"], "embed_s": new_embed_s_bs}
                    if new_embed_s_bs is not None
                    else state.batch_stats["cmo"]
                ),
            }
            aux = (loss_cls, loss_div, loss_kd, logit_s, new_bs, new_queue)
            return total, aux

        (total, (loss_cls, loss_div, loss_kd, logit_s, new_bs, new_queue)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(
                {"student": state.params["student"], "cmo": cmo_params}
            )
        )
        # per-device path: DDP-style all-reduce-average of gradients and
        # of the (per-device) new BN running stats — the EMA write is
        # linear in the previous value, so the averaged stats equal the
        # mean of the reference's per-rank stats at every step
        grads = dist.pmean(grads)
        if (queue_sharded and mem == "MoCoAtt"
                and attn not in ("qk", "self_qk", "self_qkv2", "dual2")):
            # ring attention visits bank shards in per-rank rotated
            # orders, so per-rank grads agree only to fp reassociation;
            # pmean over 'model' keeps the replicated state bit-identical
            # across model ranks (the non-ring paths are exactly
            # replicated and skip this collective).
            grads = jax.tree_util.tree_map(
                lambda v: jax.lax.pmean(v, MODEL_AXIS), grads)
        new_bs = dist.pmean(new_bs)
        new_momentum_bs = dist.pmean(new_momentum_bs)
        # the key head is EMA-tracked, never SGD-trained (train_student_moma:343)
        grads["cmo"][key_head] = jax.tree_util.tree_map(
            jnp.zeros_like, grads["cmo"][key_head]
        )
        replacements = dict(batch_stats=new_bs, queue=new_queue)
        if cross_arch:
            replacements.update(
                ema_params=new_momentum_params,
                ema_batch_stats=new_momentum_bs,
            )
        else:
            replacements.update(
                teacher_params=new_momentum_params,
                teacher_batch_stats=new_momentum_bs,
            )
        new_state = state.apply_gradients(grads, **replacements)
        # restore the EMA'd key head (SGD touched it with zero grads, but
        # weight decay inside the chain would still shrink it — overwrite)
        new_cmo = dict(new_state.params["cmo"])
        new_cmo[key_head] = cmo_params_key_head
        new_state = new_state.replace(
            params={**new_state.params, "cmo": new_cmo}
        )

        metrics = dist.pmean(
            {
                "loss": total,
                "loss_cls": loss_cls,
                "loss_div": loss_div,
                "loss_kd": loss_kd,
                "acc1": jnp.mean(
                    (jnp.argmax(logit_s, -1) == labels).astype(jnp.float32)
                )
                * 100.0,
                "acc5": jnp.mean(
                    jnp.any(
                        jax.lax.top_k(logit_s, min(5, logit_s.shape[-1]))[1]
                        == labels[:, None],
                        axis=-1,
                    ).astype(jnp.float32)
                )
                * 100.0,
            }
        )
        metrics["queue_ptr"] = new_queue.ptr  # int; identical on all devices
        return new_state, metrics

    if bn_mode == "global":
        return jitopt.jit(step, donate_argnums=(0,) if donate else ())
    return _shard_mapped_step(step, mesh, bn_mode, donate,
                              queue_sharded=queue_sharded)


def _make_moma_accum_step(cfg, heads, augment_fn, donate, cross_arch,
                          kl_train_bn, M):
    """MoMA step with gradient accumulation: microbatch i IS virtual DDP
    rank i of an M-rank reference run (contrast_trainer.py's world),
    executed sequentially on one mesh.

    The coupling that used to make this 'impossible' — every rank's
    contrast loss reads ALL ranks' same-step keys (all_k,
    contrast_trainer.py:83-88) — dissolves because keys are GRADIENT-FREE:
    phase A scans the teacher KL forwards per rank (nothing retained),
    phase B scans the post-EMA momentum-encoder key forwards over the
    Shuffle-BN-permuted global batch (only the (B, D) keys retained),
    and phase C scans the student grads per rank against the full all_k
    and the PRE-update queue (read-before-write, mem_moco.py:89-99),
    holding one microbatch's activations at a time.  One optimizer step,
    one queue advance by B — exactly the reference's M-rank step.

    Per-rank semantics mirrored from the bn='local' shard_map path (the
    parity oracle, tests/test_moma_grad_accum.py):
      - BN statistics are per-microbatch (per-rank); the running-stat
        writes are averaged at step end (pmean's sequential equivalent —
        averaging commutes with the linear EMA write).
      - augment rng: fold_in(k_aug, i) == fold_in(k_aug, axis_index).
      - gradients/metrics averaged over microbatches == DDP all-reduce.
    """
    import functools

    from moma_tpu.moma.queue import queue_update

    c, dv, b = cfg.distill.cls, cfg.distill.div, cfg.distill.beta
    kd_T = cfg.distill.kd_T
    alpha = cfg.moma.alpha
    nce_t = cfg.moma.nce_t
    mem = cfg.moma.mem
    # self_viz trains exactly as 'self' (same module set/params;
    # the viz map is an eval-time output — cmo.py ATTN_SETS note)
    attn = "self" if cfg.moma.attn == "self_viz" else cfg.moma.attn
    shuffle_bn = cfg.moma.shuffle_bn
    use_remat = bool(getattr(cfg.run, "remat", False))
    need_kt = cross_arch and mem in ("MoCoST", "MoCoSSTT")

    def step(state: MomaState, batch, rng):
        B = batch["image"].shape[0]
        if B % M != 0:
            raise ValueError(f"batch size {B} not divisible by "
                             f"grad_accum={M}")
        mb = B // M
        imgs_raw = batch["image"].reshape(M, mb, *batch["image"].shape[1:])
        labels = batch["label"].reshape(M, mb)

        # rng splits in the M=1 step's order (parity with bn='local')
        k_aug = k_perm = k_aug2 = None
        if augment_fn is not None:
            rng, k_aug = jax.random.split(rng)
        if shuffle_bn and "shuffle_perm" not in batch:
            rng, k_perm = jax.random.split(rng)
        if mem == "MoCoSSTT" and augment_fn is not None:
            rng, k_aug2 = jax.random.split(rng)

        # ---- phase A: augment + teacher KL forward per virtual rank
        # (gradient-free scan; each rank's BN chain starts from the
        # pre-step running stats, like the reference's per-GPU copies)
        def phase_kl(_, xs):
            i, im_raw = xs
            im = (
                augment_fn(im_raw, jax.random.fold_in(k_aug, i))
                if augment_fn is not None else im_raw
            )
            t_vars = {
                "params": state.teacher_params,
                "batch_stats": state.teacher_batch_stats,
            }
            if cross_arch:
                feat_t, logit_t = state.teacher_apply_fn(
                    t_vars, im, train=False
                )
                t_bs = state.teacher_batch_stats
            elif kl_train_bn:
                (feat_t, logit_t), t_mut = state.teacher_apply_fn(
                    t_vars, im, train=True, mutable=["batch_stats"]
                )
                t_bs = t_mut.get("batch_stats", {})
            else:
                feat_t, logit_t = state.teacher_apply_fn(
                    t_vars, im, train=False
                )
                t_bs = state.teacher_batch_stats
            out = {"im": im, "logit_t": logit_t, "t_bs": t_bs}
            if need_kt:
                out["feat_t_last"] = feat_t[-1]
            return None, out

        _, a = jax.lax.scan(
            phase_kl, None, (jnp.arange(M, dtype=jnp.int32), imgs_raw)
        )
        images = a["im"]              # (M, mb, ...) augmented
        logit_t_per = jax.lax.stop_gradient(a["logit_t"])
        t_bs_per = a["t_bs"]          # stacked per-rank KL-forward stats

        # ---- EMA (pre-step student params; reference order loops:310)
        cmo_params = dict(state.params["cmo"])
        key_head = "embed_ema" if cross_arch else "embed_t"
        if cross_arch:
            new_momentum_params = ema_update(
                state.ema_params, state.params["student"], alpha
            )
        else:
            new_momentum_params = ema_update(
                state.teacher_params, state.params["student"], alpha
            )
        if cfg.moma.head in ("mlp", "mlp_byol"):
            cmo_params_key_head = ema_update(
                cmo_params[key_head], state.params["cmo"]["embed_s"], alpha
            )
        else:
            cmo_params_key_head = cmo_params[key_head]

        # ---- Shuffle-BN permutation over the GLOBAL (all-rank) batch
        img_shape = images.shape[2:]
        all_images = images.reshape(B, *img_shape)
        if shuffle_bn:
            if "shuffle_perm" in batch:
                perm = batch["shuffle_perm"]
            else:
                perm = jax.random.permutation(k_perm, B)
            inv = jnp.argsort(perm)
            key_images = all_images[perm].reshape(M, mb, *img_shape)
        else:
            key_images = images

        # ---- phase B: momentum-encoder key forwards per rank (no grad);
        # rank i's BN chain continues from ITS KL-forward stats
        def phase_key(_, xs):
            key_im, t_bs = xs
            if cross_arch:
                (feat_key, _), m_mut = state.apply_fn(
                    {
                        "params": new_momentum_params,
                        "batch_stats": state.ema_batch_stats,
                    },
                    key_im, train=True, mutable=["batch_stats"],
                )
            else:
                (feat_key, _), m_mut = state.teacher_apply_fn(
                    {"params": new_momentum_params, "batch_stats": t_bs},
                    key_im, train=True, mutable=["batch_stats"],
                )
            return None, {
                "feat_key_last": feat_key[-1],
                "m_bs": m_mut.get("batch_stats", {}),
            }

        _, kb = jax.lax.scan(phase_key, None, (key_images, t_bs_per))
        # per-rank running-stat writes averaged (== bn='local' pmean)
        new_momentum_bs = jax.tree_util.tree_map(
            lambda x: jnp.mean(x, axis=0), kb["m_bs"]
        )
        feat_key_flat = kb["feat_key_last"].reshape(
            B, *kb["feat_key_last"].shape[2:]
        )
        # momentum head in eval mode (loops:313) — row-wise, safe on the
        # concatenated batch
        k_emb_full, _ = heads.embed(
            key_head,
            {**cmo_params, key_head: cmo_params_key_head},
            state.batch_stats["cmo"],
            feat_key_flat,
            train=False,
        )
        k_emb_full = jax.lax.stop_gradient(k_emb_full)
        if shuffle_bn:
            all_k = k_emb_full[inv]     # unshuffle (contrast_trainer:124-131)
        else:
            all_k = k_emb_full
        k_per = all_k.reshape(M, mb, all_k.shape[-1])

        kt_per = all_kt = None
        if need_kt:
            feat_t_flat = a["feat_t_last"].reshape(
                B, *a["feat_t_last"].shape[2:]
            )
            all_kt, _ = heads.embed(
                "embed_t", cmo_params, state.batch_stats["cmo"],
                jax.lax.stop_gradient(feat_t_flat), train=False,
            )
            all_kt = jax.lax.stop_gradient(all_kt)
            kt_per = all_kt.reshape(M, mb, all_kt.shape[-1])

        # ---- phase C: student grads per virtual rank vs the full all_k
        # and the PRE-update queue; accumulate (DDP all-reduce average)
        def student_fwd(p, bs, im):
            return state.apply_fn(
                {"params": p, "batch_stats": bs}, im,
                train=True, mutable=["batch_stats"],
            )

        if use_remat:
            student_fwd = jax.checkpoint(student_fwd)

        params_in = {"student": state.params["student"], "cmo": cmo_params}

        def loss_fn(params, i, im, lab, logit_t, k_i, kt_i, im_raw):
            (feat_s, logit_s), mut = student_fwd(
                params["student"], state.batch_stats["student"], im
            )
            loss_cls = F.cross_entropy(logit_s, lab)
            loss_div = F.kd_kl(logit_s, logit_t, kd_T)
            q, new_embed_s_bs = heads.embed(
                "embed_s", params["cmo"], state.batch_stats["cmo"],
                feat_s[-1], train=True,
            )
            attn_fns = heads.attn_fns(params["cmo"])
            if mem == "MoCoAtt":
                logits, _ = step_moco_att(
                    state.queue, q, k_i, all_k, nce_t, attn, attn_fns
                )
                logits_list = [logits]
            elif mem in ("MoCoST", "MoCoSSTT"):
                q_in, k_in = q, k_i
                kt_in = kt_i if kt_per is not None else k_i
                if attn == "self" and attn_fns:
                    q_in = attn_fns["atts_q"](q_in)
                    k_in = attn_fns["atts_k"](k_in)
                if mem == "MoCoSSTT":
                    im2 = (
                        augment_fn(im_raw, jax.random.fold_in(k_aug2, i))
                        if augment_fn is not None else im
                    )
                    (feat_s2, _), _ = student_fwd(
                        params["student"], state.batch_stats["student"], im2
                    )
                    qt_in, _ = heads.embed(
                        "embed_s", params["cmo"], state.batch_stats["cmo"],
                        feat_s2[-1], train=True,
                    )
                    if attn == "self" and attn_fns:
                        qt_in = attn_fns["atts_q"](qt_in)
                    # enqueue handled once outside; new_queue here is DCE'd
                    ls, lst, lts, ltt, _ = step_moco_sstt(
                        state.queue, q_in, k_in, qt_in, kt_in,
                        None, None, nce_t,
                    )
                    logit_s_out = logit_s
                    logits_list = [ls, lst, lts, ltt]
                else:
                    ls, lst, _ = step_moco_st(
                        state.queue, q_in, k_in, kt_in, None, None, nce_t
                    )
                    logits_list = [ls]
            else:  # MoCo
                q_in, k_in = q, k_i
                if attn == "self" and attn_fns:
                    q_in = attn_fns["atts_q"](q_in)
                    k_in = attn_fns["atts_k"](k_in)
                logits, _ = step_moco(state.queue, q_in, k_in, None, nce_t)
                logits_list = [logits]
            loss_kd = sum(contrast_ce(lg) for lg in logits_list) / len(
                logits_list
            )
            total = c * loss_cls + dv * loss_div + b * loss_kd
            new_bs = {
                "student": mut.get("batch_stats", {}),
                "cmo": (
                    {**state.batch_stats["cmo"], "embed_s": new_embed_s_bs}
                    if new_embed_s_bs is not None
                    else state.batch_stats["cmo"]
                ),
            }
            aux = (loss_cls, loss_div, loss_kd, logit_s, new_bs)
            return total, aux

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def phase_grad(carry, xs):
            g_sum, m_sum, bs_sum = carry
            (total, (loss_cls, loss_div, loss_kd, logit_s, new_bs)), grads = (
                grad_fn(
                    params_in, xs["i"], xs["im"], xs["lab"], xs["logit_t"],
                    xs["k"], xs.get("kt"), xs.get("im_raw"),
                )
            )
            lab = xs["lab"]
            mets = {
                "loss": total,
                "loss_cls": loss_cls,
                "loss_div": loss_div,
                "loss_kd": loss_kd,
                "acc1": jnp.mean(
                    (jnp.argmax(logit_s, -1) == lab).astype(jnp.float32)
                )
                * 100.0,
                "acc5": jnp.mean(
                    jnp.any(
                        jax.lax.top_k(logit_s, min(5, logit_s.shape[-1]))[1]
                        == lab[:, None],
                        axis=-1,
                    ).astype(jnp.float32)
                )
                * 100.0,
            }
            add = lambda t, u: jax.tree_util.tree_map(jnp.add, t, u)
            return (add(g_sum, grads), add(m_sum, mets),
                    add(bs_sum, new_bs)), None

        xs = {
            "i": jnp.arange(M, dtype=jnp.int32),
            "im": images,
            "lab": labels,
            "logit_t": logit_t_per,
            "k": k_per,
        }
        if kt_per is not None:
            xs["kt"] = kt_per
        if mem == "MoCoSSTT":
            xs["im_raw"] = imgs_raw
        zeros_like_f32 = functools.partial(
            jax.tree_util.tree_map, lambda x: jnp.zeros(x.shape, x.dtype)
        )
        g0 = zeros_like_f32(params_in)
        m0 = {k: jnp.zeros((), jnp.float32)
              for k in ("loss", "loss_cls", "loss_div", "loss_kd",
                        "acc1", "acc5")}
        bs0 = zeros_like_f32(state.batch_stats)
        (g_sum, m_sum, bs_sum), _ = jax.lax.scan(
            phase_grad, (g0, m0, bs0), xs
        )
        mean_over_m = functools.partial(
            jax.tree_util.tree_map, lambda x: x / M
        )
        grads = mean_over_m(g_sum)
        metrics = mean_over_m(m_sum)
        new_bs = mean_over_m(bs_sum)

        # ---- ONE queue advance by the global key count (mem_moco.py:99):
        # enqueue keys use the PRE-step attention params — gradients never
        # flow into the enqueue (the queue is detached when read)
        attn_fns_pre = heads.attn_fns(cmo_params)
        if mem == "MoCo":
            keys_in = (
                attn_fns_pre["atts_queue"](all_k)
                if attn == "self" and attn_fns_pre else all_k
            )
            new_queue = queue_update(state.queue, {"memory": keys_in})
        elif mem == "MoCoAtt":
            new_queue = queue_update(state.queue, {"memory": all_k})
        else:  # MoCoST / MoCoSSTT
            if attn == "self" and attn_fns_pre:
                # atts_k mixes only within a rank's rows (per-rank
                # batch-token attention) — vmap over the rank axis
                k_in_all = jax.vmap(attn_fns_pre["atts_k"])(k_per).reshape(
                    B, -1
                )
            else:
                k_in_all = all_k
            new_queue = queue_update(
                state.queue,
                {
                    "memory_s": k_in_all,
                    "memory_t": all_kt if all_kt is not None else all_k,
                },
            )

        grads["cmo"][key_head] = jax.tree_util.tree_map(
            jnp.zeros_like, grads["cmo"][key_head]
        )
        replacements = dict(batch_stats=new_bs, queue=new_queue)
        if cross_arch:
            replacements.update(
                ema_params=new_momentum_params,
                ema_batch_stats=new_momentum_bs,
            )
        else:
            replacements.update(
                teacher_params=new_momentum_params,
                teacher_batch_stats=new_momentum_bs,
            )
        new_state = state.apply_gradients(grads, **replacements)
        new_cmo = dict(new_state.params["cmo"])
        new_cmo[key_head] = cmo_params_key_head
        new_state = new_state.replace(
            params={**new_state.params, "cmo": new_cmo}
        )
        metrics["queue_ptr"] = new_queue.ptr
        return new_state, metrics

    return jitopt.jit(step, donate_argnums=(0,) if donate else ())


def _shard_mapped_step(step, mesh, bn_mode: str, donate: bool,
                       queue_sharded: bool = False):
    """Wrap the per-device step body in shard_map over the 'data' axis.

    The body computes on its local batch shard (per-device BN — one of
    the reference's DDP ranks); everything device-varying is pmean'd /
    gathered inside, so every output is replicated (out_specs P()).
    bn='sync' additionally pmeans BN batch statistics over 'data' via the
    fused_bn default-axis-name context (active during tracing).

    queue_sharded (--model_parallel > 1): the negative bank's rows ride
    the 'model' axis — its leaves get P('model', None) in/out specs and
    the body sees only the local (K/mp, D) block (queue.py's sharded
    step does the explicit collectives); everything else stays
    model-replicated.
    """
    from jax.sharding import PartitionSpec as P

    from moma_tpu.core.mesh import shard_map_compat

    def body(state, batch, rng):
        if bn_mode == "sync":
            from moma_tpu.ops.fused_bn import bn_axis_name

            with bn_axis_name(DATA_AXIS):
                return step(state, batch, rng)
        return step(state, batch, rng)

    def run(state, batch, rng):
        batch_specs = {
            k: (
                P()
                if k == "shuffle_perm"
                else P(DATA_AXIS, *([None] * (jnp.ndim(v) - 1)))
            )
            for k, v in batch.items()
        }
        state_specs = jax.tree_util.tree_map(lambda _: P(), state)
        if queue_sharded:
            state_specs = state_specs.replace(
                queue=state_specs.queue.replace(
                    memory={k: P(MODEL_AXIS, None)
                            for k in state.queue.memory}
                )
            )
        f = shard_map_compat(
            body, mesh, in_specs=(state_specs, batch_specs, P()),
            out_specs=(state_specs, P()),
        )
        return f(state, batch, rng)

    return jitopt.jit(run, donate_argnums=(0,) if donate else ())


def run_moma(cfg: Config, synthetic: bool = False):
    """MoMA student training driver (train_student_moma.py:227-604)."""
    run_dir = os.path.join(cfg.run.save_dir, f"moma_{cfg.run_name}")
    os.makedirs(run_dir, exist_ok=True)
    stats = StatsWriter(run_dir)
    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))

    jitopt.set_scoped_vmem(cfg.run.scoped_vmem_kib)
    mesh = create_mesh(model_parallel=cfg.run.model_parallel)
    n_cls = cfg.model_s.n_cls
    dtype = jnp.bfloat16 if cfg.run.half_precision else None
    student = create_model(cfg.model_s.name, num_classes=n_cls, dtype=dtype)
    teacher = create_model(cfg.model_t.name, num_classes=n_cls, dtype=dtype)

    train_ds, val_ds, test_ds = build_datasets(cfg, synthetic)
    train_loader = Loader(train_ds, cfg.data.batch_size, train=True,
                          seed=cfg.run.seed, num_workers=cfg.data.num_workers)
    val_loader = Loader(val_ds, cfg.data.eval_batch_size, train=False,
                        num_workers=cfg.data.num_workers)
    test_loader = Loader(test_ds, cfg.data.eval_batch_size, train=False,
                         num_workers=cfg.data.num_workers)
    steps_per_epoch = len(train_loader)

    rng = jax.random.PRNGKey(cfg.run.seed)
    init_s, init_t, init_cmo, init_q, train_rng = jax.random.split(rng, 5)
    sample = jnp.zeros(
        (2, cfg.data.image_size, cfg.data.image_size, 3),
        jnp.bfloat16 if dtype else jnp.float32,
    )
    vars_s = student.init(init_s, sample, train=False)
    vars_t = teacher.init(init_t, sample, train=False)
    for which, mc, v in (("student", cfg.model_s, "vars_s"), ("teacher", cfg.model_t, "vars_t")):
        pre = mc.pretrain
        if pre:
            from moma_tpu.models.pretrained import load_pretrained_params

            # resolves paths AND preset tags (reference --std_pre/--tec_pre
            # names, model_def.py:15-49); raises on an unresolvable tag.
            if which == "student":
                vars_s = load_pretrained_params(vars_s, pre, strict=mc.strict)
            else:
                vars_t = load_pretrained_params(vars_t, pre, strict=mc.strict)

    # same-arch: teacher IS the momentum encoder (EMA'd from the student).
    # cross-arch (e.g. ViT teacher -> CNN student, config #5): CMO_EmaTec
    # mode — EMA copy of the student is the momentum encoder, the fixed
    # teacher contributes KL (+ dual-bank keys for MoCoST/SSTT).
    s_struct = jax.tree_util.tree_structure(vars_s["params"])
    t_struct = jax.tree_util.tree_structure(vars_t["params"])
    cross_arch = s_struct != t_struct
    if cross_arch:
        print(
            f"[moma] cross-arch ({cfg.model_t.name} teacher -> "
            f"{cfg.model_s.name} student): EmaTec momentum-encoder mode"
        )

    feat_s_shapes, _ = probe_shapes(student, cfg.data.image_size, cfg.data.batch_size)
    feat_t_shapes, _ = probe_shapes(teacher, cfg.data.image_size, cfg.data.batch_size)
    s_dim = feat_s_shapes[-1][-1]
    t_dim = feat_t_shapes[-1][-1]
    feat_dim = cfg.moma.feat_dim if cfg.moma.head != "None" else s_dim

    heads = CMOHeads(
        head=cfg.moma.head, attn=cfg.moma.attn, feat_dim=feat_dim,
        s_dim=s_dim, t_dim=t_dim, dtype=dtype, include_ema=cross_arch,
    )
    cmo_params, cmo_bs = heads.init(init_cmo)
    queue_names = (
        ("memory_s", "memory_t") if cfg.moma.mem in ("MoCoST", "MoCoSSTT")
        else ("memory",)
    )
    queue = QueueState.create(init_q, cfg.moma.nce_k, feat_dim, names=queue_names)

    tx = make_sgd(
        lr_schedule(
            cfg.optim.learning_rate, cfg.run.epochs, steps_per_epoch,
            cosine=cfg.optim.cosine, decay_rate=cfg.optim.lr_decay_rate,
            decay_epochs=cfg.optim.lr_decay_epochs,
            warmup_epochs=cfg.optim.warmup_epochs,
        ),
        momentum=cfg.optim.momentum,
        weight_decay=cfg.optim.weight_decay,
        nesterov=cfg.optim.nesterov,
        grad_clip=cfg.optim.grad_clip,
        trust_ratio=cfg.optim.trust_ratio,
    )
    params = {"student": vars_s["params"], "cmo": cmo_params}
    state = MomaState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats={"student": vars_s.get("batch_stats", {}), "cmo": cmo_bs},
        teacher_params=vars_t["params"],
        teacher_batch_stats=vars_t.get("batch_stats", {}),
        queue=queue,
        opt_state=tx.init(params),
        # EmaTec: the momentum encoder starts as a DISTINCT copy of the
        # student (aliased buffers break donation: 'donate same buffer twice')
        ema_params=(
            jax.tree_util.tree_map(jnp.copy, vars_s["params"])
            if cross_arch else None
        ),
        ema_batch_stats=(
            jax.tree_util.tree_map(jnp.copy, vars_s.get("batch_stats", {}))
            if cross_arch else None
        ),
        tx=tx,
        apply_fn=student.apply,
        teacher_apply_fn=_teacher_apply(cfg, teacher),
    )
    state = jax.device_put(state, replicated_sharding(mesh))
    if cfg.run.pp_microbatch and cfg.run.teacher_parallel != "pipeline":
        raise ValueError(
            "--pp_microbatch only applies with --teacher_parallel pipeline")
    if cfg.run.model_parallel > 1:
        # shard the negative queue's rows over 'model' (queue.py:17-21):
        # the contrast matmul q @ queue^T computes (B, K/model)-sharded
        # logits and the contrast CE's logsumexp reduces with one psum
        # inserted by jit — the scaling path for large K.  Loss parity vs
        # the replicated queue: tests/test_queue_model_parallel.py.
        from jax.sharding import NamedSharding, PartitionSpec as P

        if cfg.run.bn != "global":
            # round-3: bn='local'/'sync' x model_parallel IS supported for
            # the standard same-arch MoCo path — the shard_map body runs
            # the explicit-collective sharded-bank contrast
            # (queue.py step_moco_sharded; parity:
            # tests/test_moma_local_bn_mp.py).  The remaining exclusions
            # are structural, not arbitrary:
            if cross_arch:
                raise ValueError(
                    "bn='local'/'sync' with --model_parallel does not "
                    "compose with the cross-arch TP/PP/EP teachers: those "
                    "shard via GSPMD NamedSharding annotations, which "
                    "cannot appear inside a shard_map body (per-device "
                    "code).  Use bn='global' for cross-arch model-parallel "
                    "runs.")
            # round-4 completed the matrix: ALL four mems have explicit-
            # collective sharded-bank steps (queue.py step_moco_
            # {st,sstt,att}_sharded; oracle parity:
            # tests/test_moma_local_bn_mp_variants.py) — no mem gate.
        if cfg.run.sequence_parallel and not cross_arch:
            raise ValueError(
                "--sequence_parallel applies to the tensor-parallel ViT "
                "teacher (cross-arch/EmaTec mode only)"
            )
        if cfg.run.teacher_parallel != "tensor" and not cross_arch:
            raise ValueError(
                f"--teacher_parallel {cfg.run.teacher_parallel} applies to "
                "the ViT KL-teacher (cross-arch/EmaTec mode only)"
            )
        mp = mesh.shape["model"]
        if cfg.moma.nce_k % mp != 0:
            raise ValueError(
                f"nce_k={cfg.moma.nce_k} not divisible by "
                f"model_parallel={mp}"
            )
        state = state.replace(
            queue=state.queue.replace(
                memory={
                    k: jax.device_put(v, NamedSharding(mesh, P("model", None)))
                    for k, v in state.queue.memory.items()
                }
            )
        )
        print(f"[moma] negative queue (K={cfg.moma.nce_k}) sharded over "
              f"'model'={mp}")
        if cross_arch:
            # tensor-parallel fixed teacher (models/vit_tp.py): in EmaTec
            # mode the KL teacher is frozen (the momentum encoder is a
            # student copy), so its weights convert ONCE to the
            # head/hidden-sharded TP layout — each chip stores 1/mp of
            # every block and GSPMD inserts the two per-block all-reduces.
            # NOTE: checkpoints then hold the TP layout; resume with the
            # same --model_parallel.
            from moma_tpu.models.vit_tp import (
                check_tp_teacher, is_tp_model, make_tp_vit_apply, tp_place,
            )

            if cfg.run.teacher_parallel == "expert":
                # expert parallelism (models/vit_moe.py): the MoE ViT
                # KL-teacher's experts shard E/mp per chip; the dispatch/
                # combine einsums become the cross-chip token exchange.
                from moma_tpu.models.vit_moe import (
                    check_ep_teacher, moe_place,
                )

                if cfg.run.sequence_parallel:
                    raise ValueError(
                        "--sequence_parallel applies to the TENSOR-parallel"
                        " teacher; --teacher_parallel expert shards the MoE"
                        " expert axis instead"
                    )
                check_ep_teacher(
                    teacher, mesh,
                    getattr(cfg.moma, "teacher_quant", "none"),
                )
                state = state.replace(
                    teacher_params=moe_place(state.teacher_params, mesh),
                    teacher_apply_fn=teacher.clone(ep_mesh=mesh).apply,
                )
                print(f"[moma] MoE ViT teacher expert-parallel over "
                      f"'model'={mp}: {teacher.num_experts} experts -> "
                      f"{teacher.num_experts // mp}/chip")
            elif cfg.run.teacher_parallel == "pipeline":
                # GPipe staging (models/vit_pp.py): depth/S blocks per
                # chip, activations hop stage-to-stage over ppermute.
                from moma_tpu.models.vit_pp import (
                    check_pp_teacher, is_pp_model, make_pp_vit_apply,
                    pp_place,
                )

                if cfg.run.sequence_parallel:
                    raise ValueError(
                        "--sequence_parallel applies to the TENSOR-parallel"
                        " teacher; --teacher_parallel pipeline stages whole"
                        " blocks (nothing to token-shard between them)"
                    )
                if not is_pp_model(teacher):
                    raise ValueError(
                        "--teacher_parallel pipeline requires a ViT family "
                        f"teacher, got {type(teacher).__name__}"
                    )
                n_micro = cfg.run.pp_microbatch or mp
                # under grad accumulation the teacher forward runs per
                # accumulation microbatch, so THAT is the batch the
                # pipeline splits into pp microbatches
                check_pp_teacher(
                    teacher, mesh, n_micro,
                    batch_size=cfg.data.batch_size
                    // max(1, cfg.run.grad_accum),
                    teacher_quant=getattr(cfg.moma, "teacher_quant", "none"),
                )
                state = state.replace(
                    teacher_params=pp_place(state.teacher_params, teacher, mesh),
                    teacher_apply_fn=make_pp_vit_apply(
                        teacher, mesh, n_micro=n_micro),
                )
                print(f"[moma] ViT teacher pipeline-parallel over "
                      f"'model'={mp}: {teacher.depth // mp} blocks/stage, "
                      f"{n_micro} microbatches")
            elif is_tp_model(teacher):
                check_tp_teacher(
                    teacher, mesh,
                    getattr(cfg.moma, "teacher_quant", "none"),
                )
                state = state.replace(
                    teacher_params=tp_place(state.teacher_params, teacher, mesh),
                    teacher_apply_fn=make_tp_vit_apply(
                        teacher, mesh,
                        sequence_parallel=cfg.run.sequence_parallel,
                    ),
                )
                sp_note = " + sequence-parallel residual stream" \
                    if cfg.run.sequence_parallel else ""
                print(f"[moma] ViT teacher tensor-parallel over "
                      f"'model'={mp}: attention heads "
                      f"{teacher.num_heads}->{teacher.num_heads // mp}/chip, "
                      f"MLP hidden sharded{sp_note}")
            elif cfg.run.sequence_parallel:
                raise ValueError(
                    "--sequence_parallel requires a tensor-parallel ViT "
                    f"teacher, got {type(teacher).__name__}"
                )
    elif cfg.run.sequence_parallel:
        raise ValueError("--sequence_parallel requires --model_parallel > 1")
    elif cfg.run.teacher_parallel != "tensor":
        raise ValueError(
            f"--teacher_parallel {cfg.run.teacher_parallel} requires "
            "--model_parallel > 1")

    train_aug, eval_norm = augment_fns(cfg)
    if cfg.moma.kl_teacher_bn == "exact":
        # the reference's real BN schedule: model_t.eval() at the top of
        # every epoch -> KL forward on running stats for that epoch's
        # FIRST batch, batch stats after (set_bn_train persists,
        # loops_moma.py:224-227,314-318).  Two jitted programs; the epoch
        # loop dispatches (costs one extra compile, cached thereafter).
        step_fn = (
            make_moma_train_step(
                cfg, heads, train_aug, donate=cfg.run.donate,
                cross_arch=cross_arch, mesh=mesh, kl_train_bn_override=False,
            ),
            make_moma_train_step(
                cfg, heads, train_aug, donate=cfg.run.donate,
                cross_arch=cross_arch, mesh=mesh, kl_train_bn_override=True,
            ),
        )
    else:
        step_fn = make_moma_train_step(
            cfg, heads, train_aug, donate=cfg.run.donate,
            cross_arch=cross_arch, mesh=mesh,
        )
    eval_step = make_eval_step(student.apply, n_cls, normalize_fn=eval_norm)

    if cfg.run.preflight_eval:
        # reference --skip_validation (inverted store_false flag): check
        # the loaded teacher on the test split before training
        # (train_student_moma.py:466-474).  Runs on the plain teacher tree
        # (before any TP/PP placement).
        t_eval = make_eval_step(teacher.apply, n_cls, normalize_fn=eval_norm)
        pre = evaluate(vars_t["params"], vars_t.get("batch_stats", {}),
                       test_loader, t_eval, mesh, n_cls)
        print(f"[pre-flight] teacher test acc {pre['acc']:.2f} "
              f"f1 {pre['f1']:.4f}")

    def full_state(st):
        """Checkpointable FULL state — including the EmaTec momentum
        encoder in cross-arch mode (a resume without it would restart the
        key encoder from epoch 0 against late-training params)."""
        d = {
            "params": st.params, "batch_stats": st.batch_stats,
            "teacher_params": st.teacher_params,
            "teacher_batch_stats": st.teacher_batch_stats,
            "queue": st.queue, "opt_state": st.opt_state,
            "step": st.step,
        }
        if cross_arch:
            d["ema_params"] = st.ema_params
            d["ema_batch_stats"] = st.ema_batch_stats
        return d

    best_acc, best_f1 = -1.0, -1.0
    t_start = time.time()
    start_epoch = 1
    if cfg.run.resume and ckpt.exists("latest"):
        try:
            restored = ckpt.restore("latest", full_state(state))
        except Exception:
            if not cross_arch:
                raise
            # checkpoint written before ema_params were checkpointed:
            # restore what exists; the momentum encoder restarts (warned)
            template = {k: v for k, v in full_state(state).items()
                        if not k.startswith("ema_")}
            restored = ckpt.restore("latest", template)
            print("[resume] WARNING: old cross-arch checkpoint without "
                  "ema_params — the EmaTec momentum encoder restarts "
                  "from the current student copy")
        state = state.replace(**restored)
        meta = ckpt.meta("latest") or {}
        start_epoch = int(meta.get("epoch", 0)) + 1
        # exact mid-epoch resume point (see train/teacher.py)
        resume_step = int(meta.get("resume_step", 0))
        # best-metric thresholds survive the restart (else the first
        # post-resume epoch would overwrite the real best checkpoints)
        for tag, var in (("best_acc", "val_acc"), ("best_f1", "val_f1")):
            m = ckpt.meta(tag)
            if m is not None:
                if tag == "best_acc":
                    best_acc = float(m.get(var, -1.0))
                else:
                    best_f1 = float(m.get(var, -1.0))
        print(f"[resume] from epoch {start_epoch}"
              + (f" step {resume_step}" if resume_step else "")
              + f" (best_acc={best_acc:.2f}, best_f1={best_f1:.4f})")
    else:
        resume_step = 0

    from moma_tpu.core.preempt import GracefulStop

    stop_guard = GracefulStop()
    stop_guard.__enter__()
    try:
        return _epoch_loop_moma(
            cfg, state, stats, ckpt, stop_guard, step_fn, eval_step,
            train_loader, val_loader, test_loader, train_rng, mesh, n_cls,
            start_epoch, best_acc, best_f1, t_start, run_dir, full_state,
            resume_step=resume_step,
        )
    finally:
        # restore prior handlers so a later Ctrl-C/SIGTERM in this process
        # is not swallowed by a dead flag
        stop_guard.__exit__()


def _epoch_loop_moma(cfg, state, stats, ckpt, stop_guard, step_fn, eval_step,
                     train_loader, val_loader, test_loader, train_rng, mesh,
                     n_cls, start_epoch, best_acc, best_f1, t_start, run_dir,
                     full_state, resume_step=0):
    import contextlib

    from moma_tpu.train.loop import NonFiniteLossError

    for epoch in range(start_epoch, cfg.run.epochs + 1):
        if cfg.run.profile_dir and epoch == start_epoch:
            from moma_tpu.core.profiling import trace

            ctx = trace(cfg.run.profile_dir)
        else:
            ctx = contextlib.nullcontext()
        ep_start = resume_step if epoch == start_epoch else 0
        if isinstance(step_fn, tuple):
            # kl_teacher_bn='exact': eval-BN KL forward on the epoch's
            # first batch (per-epoch model_t.eval() reset), train-BN
            # after.  A mid-epoch resume (ep_start > 0) already consumed
            # the epoch's true first batch before the preemption, so the
            # continuation uses the train-BN program throughout.
            first_fn, rest_fn = step_fn
            seen = iter(range(1 << 30))

            def epoch_step(s, b, r, _first=(ep_start == 0)):
                return (first_fn if (_first and next(seen) == 0)
                        else rest_fn)(s, b, r)
        else:
            epoch_step = step_fn
        try:
            with ctx:
                state, tr = train_one_epoch(
                    state, train_loader, epoch_step, mesh, epoch, train_rng,
                    print_freq=cfg.run.print_freq, log_fn=stats.scalar,
                    stop=stop_guard, start_step=ep_start,
                )
        except NonFiniteLossError as e:
            # failure detection: exit cleanly; 'latest' (end of the last
            # finite epoch) is the resume point
            print(f"[nan-guard] {e}; stopping — resume from the last "
                  f"epoch-end checkpoint (epoch {epoch - 1})")
            stats.update_epoch(epoch, {"nan_aborted": True})
            ckpt.wait()  # flush in-flight async save + meta
            return state, {"best_acc": best_acc, "best_f1": best_f1,
                           "run_dir": run_dir, "nan_aborted": True}
        if stop_guard.stopping:
            # preemption: persist FULL state (queue + EMA teacher + EmaTec
            # momentum encoder) + the exact batch index, so --resume
            # continues this epoch mid-flight instead of redoing it
            # see train/teacher.py: resume_step == len(loader) resumes into
            # 0 remaining batches + the epoch's eval, never a double apply
            meta = {"epoch": epoch - 1, "preempted": True,
                    "resume_step": tr["steps"]}
            ckpt.save("latest", full_state(state), meta)
            print(f"[preempt] checkpointed at epoch {epoch} step "
                  f"{tr['steps']}/{len(train_loader)}; exiting")
            return state, {"best_acc": best_acc, "best_f1": best_f1,
                           "run_dir": run_dir, "preempted": True}
        val = evaluate(
            state.params["student"], state.batch_stats["student"],
            val_loader, eval_step, mesh, n_cls,
        )
        row = {
            "train_loss": tr["loss"], "train_acc": tr["acc1"], "ips": tr["ips"],
            "val_loss": val["loss"], "val_acc": val["acc"], "val_f1": val["f1"],
        }
        if ep_start:
            # resumed epoch: train stats cover only the tail batches
            row["train_partial_from"] = ep_start
        if not cfg.run.skip_test:
            test = evaluate(
                state.params["student"], state.batch_stats["student"],
                test_loader, eval_step, mesh, n_cls,
            )
            row.update(test_acc=test["acc"], test_f1=test["f1"])
        stats.update_epoch(epoch, row)
        print(
            f"epoch {epoch}: loss {tr['loss']:.4f} acc {tr['acc1']:.2f} | "
            f"val acc {val['acc']:.2f} f1 {val['f1']:.4f} | {tr['ips']:.1f} img/s"
        )
        save_state = full_state(state)
        meta = {"epoch": epoch, **row}
        # async: the disk commit overlaps the next epoch's compute
        ckpt.save("latest", save_state, meta, block=False)
        if val["acc"] > best_acc:
            best_acc = val["acc"]
            ckpt.save("best_acc", save_state, meta, block=False)
        if val["f1"] > best_f1:
            best_f1 = val["f1"]
            ckpt.save("best_f1", save_state, meta, block=False)

    ckpt.wait()  # commit the final epoch's async saves + meta sidecars
    stats.write_params_json(
        run_dir,
        {
            "config": cfg.to_json(),
            "best_val_acc": best_acc,
            "best_val_f1": best_f1,
            "hours": (time.time() - t_start) / 3600.0,
        },
    )
    return state, {"best_acc": best_acc, "best_f1": best_f1, "run_dir": run_dir}
