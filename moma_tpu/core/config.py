"""Typed configuration tree + CLI bridge.

Replaces the reference's per-entry-point argparse blobs
(`train_student_moma.py:46-176`, `train_teacher.py:35-118`) and its
hyperparameter-encoding directory names with one dataclass tree and named
presets.  The CLI bridge accepts the reference's flag names (--model_s,
--distill, -c/-d/-b, --nce_k, ...) so existing scripts port 1:1.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from moma_tpu.core.jitopt import DEFAULT_SCOPED_VMEM_KIB

# dataset -> number of classes (reference hardcodes this map at
# train_student_moma.py:249-259)
DATASET_NUM_CLASSES = {
    "cifar100": 100,
    "imagenet": 1000,
    "prostate_hv": 4,
    "prostate_ubc": 4,
    "colon_tp": 4,
    "crc_tp": 4,
    "gastric": 8,
    "panda_512": 4,
    "kather19": 9,
    "kather19_nonorm": 9,
    "kather16": 9,
    "aggc2022": 6,
}

# training-set sizes for CRD's n_data (reference hardcodes at
# train_student_comparison.py:309-324); real manifests override these.
DATASET_N_DATA = {
    "cifar100": 50000,
    "imagenet": 1281167,
}


@dataclass
class DataConfig:
    dataset: str = "cifar100"
    data_dir: str = "./data"
    batch_size: int = 64
    eval_batch_size: int = 0  # 0 => same as batch_size
    # reference default is 8 (train_teacher.py:41); sizes the native
    # prefetcher's gather thread pool (capped at the host's core count)
    num_workers: int = 8
    image_size: int = 32
    image_resize: bool = False
    crop: float = 0.2  # RandomResizedCrop lower scale bound
    aug_train: str = "RA"  # 'RA' | 'NULL'
    ra_config: str = "rand-n2-m10-mstd0.5"
    # color-op-free RA op table (the reference's rand_augment_ops_cmc,
    # dataset/RandAugment.py:383-389 — dead upstream, exposed here)
    use_cmc: bool = False
    percent: float = 1.0  # subsample fraction (CRD sampling path)
    # stratified k-fold cross-validation over the train+val pool — the
    # reference's 5-fold loader capability (dataset/histo_dataset.py:848-
    # 1035; its histo_list_v1 fold manifests module is absent upstream).
    # -1 = off; 0..n_folds-1 selects the held-out validation fold.
    fold_idx: int = -1
    n_folds: int = 5

    @property
    def n_cls(self) -> int:
        return DATASET_NUM_CLASSES[self.dataset]


@dataclass
class ModelConfig:
    name: str = "resnet20"
    n_cls: int = 100
    pretrain: Optional[str] = None  # checkpoint path or named preset
    strict: bool = True  # False => drop classifier on load (cross-task)
    dropout: float = 0.0


@dataclass
class OptimConfig:
    learning_rate: float = 0.05
    momentum: float = 0.9
    weight_decay: float = 5e-4
    nesterov: bool = False
    cosine: bool = False
    lr_decay_rate: float = 0.1
    lr_decay_epochs: Tuple[int, ...] = (150, 180, 210)
    grad_clip: float = 0.0  # 0 => off
    # LARS layer-adaptive trust coefficient for large global batches
    # (train/state.py make_sgd; applies to >=2-D weight tensors only);
    # 0 => plain reference-parity SGD
    trust_ratio: float = 0.0
    # linear per-step LR ramp over the first N epochs (extension — the
    # reference has no warmup; core/schedules.py); 0 => reference parity
    warmup_epochs: float = 0.0


@dataclass
class DistillConfig:
    distill: str = "kd"  # kd|hint|attention|similarity|vid|crd|semckd|srrl|simkd|nst|rkd|pkt|kdsvd|correlation|moma|ab|fsp|ft
    kd_T: float = 4.0
    cls: float = 1.0  # -c
    div: float = 1.0  # -d
    beta: float = 0.0  # -b
    factor: int = 2  # -f SimKD bottleneck factor
    soft: float = 1.0  # -s SemCKD attention scale
    hint_layer: int = 1


@dataclass
class MomaConfig:
    """MoMA / NCE options (reference: train_student_moma.py:100-136)."""

    feat_dim: int = 512
    nce_k: int = 16384
    nce_t: float = 0.07  # forced to 0.15 when distill == 'moma'
    nce_m: float = 0.5
    alpha: float = 0.999  # EMA teacher momentum
    mem: str = "MoCo"  # MoCo | MoCoST | MoCoSSTT | MoCoAtt
    head: str = "mlp"  # None | linear | mlp | mlp_byol
    attn: str = "self"  # see moma/cmo.py ATTN_SETS (self|self_viz|all|...)
    mode: str = "exact"  # CRD positive mode: exact | relax
    shuffle_bn: bool = True
    # BN mode of the teacher's KL-logits forward.  The reference's
    # set_bn_train(model_t) persists WITHIN an epoch (loops_moma.py:314-318)
    # but train_distill_moma resets model_t.eval() at the start of EVERY
    # epoch (:224-227), so its KL forward uses running stats on the first
    # step of each epoch and batch stats from step 2 on.  'exact'
    # (default since round 3) reproduces that real schedule — run_moma
    # compiles a second step program for each epoch's first batch.  Its
    # cost is measured, not assumed: the rest-of-epoch program is
    # HLO-IDENTICAL to 'train' (zero steady-state cost; scripts/
    # kl_exact_cost.py) and the extra compile amortizes through the
    # persistent cache (BASELINE.md round 3).  'train' reproduces only
    # the steps>=2 steady state, 'eval' only step-1 running stats — each
    # a one-step-per-epoch deviation, numerically negligible (PARITY.md).
    kl_teacher_bn: str = "exact"
    # opt-in deviation: reuse the momentum key forward's logits for the
    # KL term instead of a second teacher forward (~25% faster steps;
    # KL then sees post-EMA params + train-mode BN)
    fast_teacher: bool = False
    # recompute-style fused Pallas forward for the (gradient-free)
    # momentum-encoder key pass (ops/fused_effnet.py).  Numerically
    # equivalent (same BN batch statistics) but measured slower than
    # XLA's forward on v5e (BASELINE.md) — opt-in 'on' only.
    fused_teacher: str = "off"
    # opt-in deviation: run every conv of the (gradient-free) teacher
    # forwards in dynamic int8 (core/quantize.py — per-batch activation
    # scales, per-channel weight scales from the live EMA params).  All
    # teacher outputs are stop_gradient'ed, so this only perturbs the KL
    # targets / contrast keys, not the gradient path structure.
    teacher_quant: str = "none"  # none | int8


@dataclass
class RunConfig:
    epochs: int = 240
    seed: int = 12345
    print_freq: int = 100
    save_dir: str = "./save"
    trial: str = "0"
    skip_test: bool = False
    # pre-flight teacher evaluation on the test split before training
    # (reference train_teacher.py:230-241 / train_student_moma.py:466-474).
    # The reference flag is `--skip_validation` with action='store_false'
    # (default True) guarded by `if not opt.skip_validation:` — i.e.
    # DESPITE its name, passing the flag RUNS the validation and the
    # default skips it.  We reproduce the behavior (default off; the
    # reference's command lines behave identically) under an honest name.
    preflight_eval: bool = False
    resume: bool = False
    half_precision: bool = True  # bf16 compute policy (TPU-native AMP)
    # BN execution mode (train/moma.py make_moma_train_step): 'global' =
    # one jitted global-batch step (implicit sync-BN; TPU-idiomatic
    # default, documented deviation from the reference's per-GPU BN);
    # 'local' = shard_map per-device BN statistics with real Shuffle-BN
    # (reference-faithful, contrast_trainer.py:90-133); 'sync' =
    # shard_map with explicit BN-stat pmean over 'data' (same numerics
    # as 'global'; exists to price the sync-BN collectives, BASELINE.md)
    bn: str = "global"
    model_parallel: int = 1
    # Megatron-style sequence parallelism on the tensor-parallel ViT
    # teacher (models/vit_tp.py): token-shard the residual stream between
    # blocks so LayerNorms/residual adds run on 1/M tokens and the
    # residual activations take 1/M memory per chip.  Requires
    # model_parallel > 1 and a ViT teacher (cross-arch mode).
    sequence_parallel: bool = False
    # How the frozen ViT KL-teacher uses the 'model' axis in cross-arch
    # mode at model_parallel > 1: 'tensor' = Megatron TP (models/vit_tp.py,
    # heads/MLP-hidden sharded, two all-reduces per block), 'pipeline' =
    # GPipe stages (models/vit_pp.py, depth/S blocks per chip, ppermute
    # hops + a (S-1)/(T+S-1) bubble; no width divisibility needed),
    # 'expert' = expert parallelism for MoE ViTs (models/vit_moe.py,
    # E/M experts per chip, dispatch/combine einsums over ICI).
    teacher_parallel: str = "tensor"
    # GPipe microbatch count T for teacher_parallel='pipeline'
    # (0 = one per stage); per-device batch must divide by T.
    pp_microbatch: int = 0
    # XLA:TPU scoped-VMEM budget (KiB) for the jitted steps — deeper
    # fusion tiles for the bandwidth-bound convs.  Measured on the
    # flagship MoMA step: default ~16 MB = 501 img/s/chip, 64 MB = 539
    # (+7.5%), 96 MB = 528 (crowds out double-buffering) — see
    # core/jitopt.py (the tuned value's single source of truth).
    # 0 = XLA default; ignored on CPU backends.
    scoped_vmem_kib: int = DEFAULT_SCOPED_VMEM_KIB
    donate: bool = True
    # gradient accumulation: split each batch into M equal microbatches
    # scanned sequentially with ONE optimizer update — the activation-
    # memory lever for backbones/batches that overflow HBM.  Supported on
    # all three steps (microbatch = virtual DDP rank; BN sees
    # per-microbatch stats like the reference's unsynced per-GPU BN).
    # On the MoMA path the same-step key coupling (all ranks' contrast
    # losses read all_k, contrast_trainer.py:83-88) is resolved by
    # computing ALL microbatches' keys first in gradient-free scans, then
    # accumulating student grads per microbatch against the full all_k —
    # the reference's M-rank step run sequentially, holding one
    # microbatch's activations at a time (train/moma.py
    # _make_moma_accum_step; parity oracle vs the bn='local' shard_map
    # path in tests/test_moma_grad_accum.py).  Requires bn='global'.
    grad_accum: int = 1
    # full-forward rematerialization (jax.checkpoint) of the STUDENT's
    # differentiated forward: backward recomputes the forward instead of
    # holding every intermediate activation — trades ~1 extra forward of
    # FLOPs for O(model-depth) activation memory.  The gradient-free
    # teacher forwards hold no activations and are untouched.  Works on
    # all three steps (vanilla/distill/moma) and composes with
    # grad_accum.  Numerics are bit-identical by construction.
    remat: bool = False
    profile_dir: str = ""  # capture a jax.profiler trace of epoch 1


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model_s: ModelConfig = field(default_factory=ModelConfig)
    model_t: Optional[ModelConfig] = None
    optim: OptimConfig = field(default_factory=OptimConfig)
    distill: DistillConfig = field(default_factory=DistillConfig)
    moma: MomaConfig = field(default_factory=MomaConfig)
    run: RunConfig = field(default_factory=RunConfig)

    def finalize(self) -> "Config":
        """Apply cross-field derivations the reference bakes into parse_option."""
        if self.distill.distill == "cmo":
            # train_student_comparison.py names the moma method 'cmo' (:332)
            self.distill.distill = "moma"
        n_cls = DATASET_NUM_CLASSES.get(self.data.dataset, self.model_s.n_cls)
        self.model_s.n_cls = n_cls
        if self.model_t is not None:
            self.model_t.n_cls = n_cls
        if self.distill.distill == "moma":
            # reference forces nce_t=0.15 for moma (train_student_moma.py:135-136)
            self.moma.nce_t = 0.15
        if self.data.eval_batch_size == 0:
            self.data.eval_batch_size = self.data.batch_size
        if self.data.fold_idx >= 0:
            if self.data.n_folds < 2:
                raise ValueError(
                    f"--n_folds must be >= 2 (got {self.data.n_folds})"
                )
            if self.data.fold_idx >= self.data.n_folds:
                raise ValueError(
                    f"--fold_idx {self.data.fold_idx} out of range for "
                    f"--n_folds {self.data.n_folds}"
                )
        return self

    @property
    def run_name(self) -> str:
        d = self.distill
        parts = [
            d.distill,
            self.data.dataset,
            self.model_s.name,
            f"bs{self.data.batch_size}",
            f"lr{self.optim.learning_rate}",
            f"c{d.cls}_d{d.div}_b{d.beta}",
            f"trial{self.run.trial}",
        ]
        if self.data.fold_idx >= 0:
            parts.insert(-1, f"fold{self.data.fold_idx}of{self.data.n_folds}")
        if self.model_t is not None:
            parts.insert(1, f"T-{self.model_t.name}")
        return "_".join(parts)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)


def _add_common_flags(p: argparse.ArgumentParser):
    p.add_argument("--print_freq", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--epochs", type=int, default=240)
    p.add_argument("--seed", type=int, default=12345)
    p.add_argument("--learning_rate", type=float, default=0.05)
    p.add_argument("--lr_decay_epochs", type=str, default="150,180,210")
    p.add_argument("--lr_decay_rate", type=float, default=0.1)
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--cosine", action="store_true")
    p.add_argument("--warmup_epochs", type=float, default=0.0,
                   help="linear LR warmup over the first N epochs "
                        "(large-batch stabilizer; 0 = reference parity)")
    p.add_argument("--trust_ratio", type=float, default=0.0,
                   help="LARS trust coefficient for large global batches "
                        "(layer-adaptive LR on weight tensors; 0 = plain "
                        "SGD, reference parity)")
    p.add_argument("--grad_clip", type=float, default=0.0,
                   help="global-norm gradient clip (0 = off)")
    p.add_argument("--dataset", type=str, default="cifar100")
    p.add_argument("--data_dir", type=str, default="./data")
    p.add_argument("--aug_train", type=str, default="RA", choices=["NULL", "RA"])
    p.add_argument("--ra_config", type=str, default="rand-n2-m10-mstd0.5",
                   help="RandAugment config string (the reference's "
                        "rand_augment_transform grammar, RandAugment.py:"
                        "405-448: m/n/mstd/w sections; the reference "
                        "hardcodes rand-n2-m10-mstd0.5)")
    p.add_argument("--use_cmc", action="store_true",
                   help="color-op-free RandAugment op table (the "
                        "reference's rand_augment_ops_cmc preset)")
    p.add_argument("--crop", type=float, default=0.2)
    p.add_argument("--image_size", type=int, default=32)
    p.add_argument("--image_resize", action="store_true")
    p.add_argument("--fold_idx", type=int, default=-1,
                   help="stratified k-fold CV: validation fold index over "
                        "the train+val pool (histo datasets; -1 = use the "
                        "dataset's native splits)")
    p.add_argument("--n_folds", type=int, default=5,
                   help="number of folds for --fold_idx (reference: 5)")
    p.add_argument("--trial", type=str, default="0")
    p.add_argument("--save_dir", type=str, default="./save")
    p.add_argument("--skip_test", action="store_true")
    p.add_argument("--skip_validation", action="store_true",
                   help="run a pre-flight eval of the loaded model/teacher "
                        "on the test split before training.  NOTE the "
                        "reference's flag is store_false-inverted: passing "
                        "it RUNS the validation (train_teacher.py:88,230) — "
                        "same here, so reference command lines behave "
                        "identically")
    p.add_argument("--fp32", action="store_true", help="disable bf16 compute")
    p.add_argument("--scoped_vmem_kib", type=int,
                   default=DEFAULT_SCOPED_VMEM_KIB,
                   help="XLA:TPU scoped-VMEM budget for the jitted steps "
                        "(KiB; 0 = XLA default ~16MB).  64MB measured "
                        "+7.5%% on the MoMA step (core/jitopt.py)")
    p.add_argument("--bn", type=str, default=None,
                   choices=["global", "local", "sync"],
                   help="BN execution mode: 'global' jitted global-batch "
                        "stats (default), 'local' per-device stats + real "
                        "Shuffle-BN (reference-faithful), 'sync' per-device "
                        "execution with cross-device stat pmean")
    p.add_argument("--sync_bn", action="store_true",
                   help="alias for --bn sync (cross-replica BN statistics)")
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--sequence_parallel", action="store_true",
                   help="Megatron-style SP on the tensor-parallel ViT "
                        "teacher: token-shard the residual stream between "
                        "blocks (1/M residual activations + sharded "
                        "LayerNorms); requires --model_parallel > 1 and a "
                        "ViT teacher")
    p.add_argument("--teacher_parallel", type=str, default="tensor",
                   choices=["tensor", "pipeline", "expert"],
                   help="how the frozen ViT teacher uses the 'model' axis "
                        "at --model_parallel > 1: Megatron tensor "
                        "parallelism (default), GPipe pipeline stages, or "
                        "expert parallelism (MoE ViTs, vit_*_moe*)")
    p.add_argument("--pp_microbatch", type=int, default=0,
                   help="GPipe microbatch count for --teacher_parallel "
                        "pipeline (0 = one per stage)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="split each batch into M microbatches scanned "
                        "sequentially with one optimizer update (activation-"
                        "memory lever; microbatch = virtual DDP rank on all "
                        "three paths — the MoMA step computes all ranks' "
                        "same-step keys gradient-free first, then "
                        "accumulates; see RunConfig.grad_accum)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the student forward in the backward "
                        "pass (activation-memory lever; composes with "
                        "--grad_accum; numerically identical)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--profile_dir", type=str, default="",
                   help="write a TensorBoard/XProf device trace of epoch 1")
    p.add_argument("--n_cls", type=int, default=0,
                   help="override class count (reference --n_cls; 0 = derive "
                        "from the dataset table)")
    # reference-compatibility no-ops: accepted so the reference's command
    # lines run unchanged (their roles are N/A on TPU / always-on here)
    for flag, why in (
        ("--gpu_id", "CUDA device list (N/A: TPU mesh)"),
        ("--dali", "DALI pipeline choice (replaced by the native loader)"),
        ("--deterministic", "cudnn determinism (JAX is deterministic)"),
        ("--weight", "dead flag in the reference (never read)"),
        ("--dist-url", "NCCL rendezvous (N/A: single-process mesh)"),
        ("--dist-backend", "NCCL backend (N/A)"),
        ("--multiprocessing-distributed", "mp.spawn mode (N/A)"),
    ):
        p.add_argument(flag, nargs="?", const=True, default=None,
                       help=f"accepted for reference compatibility, ignored: {why}")


def _resolve_bn(a) -> str:
    """--bn and the legacy --sync_bn alias must agree; an explicit
    --bn global/local combined with --sync_bn is a contradiction and
    errors rather than being silently overridden."""
    if a.bn is None:
        return "sync" if a.sync_bn else "global"
    if a.sync_bn and a.bn != "sync":
        raise SystemExit(
            f"--sync_bn contradicts --bn {a.bn}: drop one "
            "(--sync_bn is an alias for --bn sync)")
    return a.bn


def _cfg_from_common(a) -> Config:
    cfg = Config()
    cfg.data = DataConfig(
        dataset=a.dataset,
        data_dir=a.data_dir,
        batch_size=a.batch_size,
        num_workers=a.num_workers,
        image_size=a.image_size,
        image_resize=a.image_resize,
        crop=a.crop,
        aug_train=a.aug_train,
        ra_config=a.ra_config,
        use_cmc=a.use_cmc,
        fold_idx=a.fold_idx,
        n_folds=a.n_folds,
    )
    cfg.optim = OptimConfig(
        learning_rate=a.learning_rate,
        momentum=a.momentum,
        weight_decay=a.weight_decay,
        cosine=a.cosine,
        lr_decay_rate=a.lr_decay_rate,
        lr_decay_epochs=tuple(int(x) for x in a.lr_decay_epochs.split(",")),
        grad_clip=a.grad_clip,
        trust_ratio=a.trust_ratio,
        warmup_epochs=a.warmup_epochs,
    )
    cfg.run = RunConfig(
        epochs=a.epochs,
        seed=a.seed,
        print_freq=a.print_freq,
        save_dir=a.save_dir,
        trial=a.trial,
        skip_test=a.skip_test,
        preflight_eval=a.skip_validation,
        half_precision=not a.fp32,
        scoped_vmem_kib=a.scoped_vmem_kib,
        bn=_resolve_bn(a),
        model_parallel=a.model_parallel,
        sequence_parallel=a.sequence_parallel,
        teacher_parallel=a.teacher_parallel,
        pp_microbatch=a.pp_microbatch,
        grad_accum=a.grad_accum,
        remat=a.remat,
        resume=a.resume,
        profile_dir=a.profile_dir,
    )
    return cfg


def teacher_parser() -> argparse.ArgumentParser:
    """Parser mirroring train_teacher.py:35-118 (exposed for the flag-bridge
    audit, tests/test_flag_bridge_audit.py)."""
    p = argparse.ArgumentParser("moma_tpu train_teacher")
    _add_common_flags(p)
    p.add_argument("--model", type=str, default="resnet20")
    p.add_argument("--pretrain", type=str, default=None)
    p.add_argument("--not_strict", action="store_true")
    p.add_argument("--pre_strict", action="store_false", dest="pre_strict",
                   help="reference alias of strict pretrained loading "
                        "(train_teacher.py:67; passing it disables strict)")
    return p


def parse_teacher_args(argv=None) -> Config:
    """CLI mirroring train_teacher.py:35-118."""
    a = teacher_parser().parse_args(argv)
    cfg = _cfg_from_common(a)
    cfg.model_s = ModelConfig(
        name=a.model, pretrain=a.pretrain,
        strict=(not a.not_strict) and a.pre_strict,
    )
    cfg = cfg.finalize()
    if a.n_cls:  # explicit flag beats the dataset table (reference: models
        cfg.model_s.n_cls = a.n_cls  # are always built with opt.n_cls)
    return cfg


def student_parser() -> argparse.ArgumentParser:
    """Parser mirroring train_student_moma.py:46-176 /
    train_student_comparison.py (exposed for the flag-bridge audit)."""
    p = argparse.ArgumentParser("moma_tpu train_student")
    _add_common_flags(p)
    p.add_argument("--model_s", type=str, default="resnet8x4")
    p.add_argument("--model_t", type=str, default="resnet32x4")
    p.add_argument("--path_t", type=str, default=None)
    p.add_argument("--std_pre", type=str, default=None)
    p.add_argument("--std_strict", action="store_false", dest="std_strict")
    p.add_argument("--tec_pre", type=str, default=None)
    p.add_argument("--tec_strict", action="store_false", dest="tec_strict")
    p.add_argument("--distill", type=str, default="kd")
    p.add_argument("--kd_T", type=float, default=4.0)
    p.add_argument("-c", "--cls", type=float, default=1.0)
    p.add_argument("-d", "--div", type=float, default=1.0)
    p.add_argument("-b", "--beta", type=float, default=0.0)
    p.add_argument("-f", "--factor", type=int, default=2)
    p.add_argument("-s", "--soft", type=float, default=1.0)
    p.add_argument("--hint_layer", type=int, default=1, choices=[0, 1, 2, 3, 4])
    p.add_argument("--feat_dim", type=int, default=512)
    p.add_argument("--mode", type=str, default="exact", choices=["exact", "relax"])
    p.add_argument("--nce_k", type=int, default=16384)
    p.add_argument("--nce_t", type=float, default=0.07)
    p.add_argument("--nce_m", type=float, default=0.5)
    p.add_argument("--alpha", type=float, default=0.999)
    p.add_argument(
        "--mem", type=str, default="MoCo",
        choices=["MoCo", "MoCoST", "MoCoSSTT", "MoCoAtt"],
    )
    p.add_argument(
        "--head", type=str, default="None",
        choices=["None", "linear", "mlp", "mlp_byol"],
    )
    # choices= from the single source of truth: an unknown --attn must
    # ERROR, not silently train a different model (the reference coerces
    # unknowns to 'self', criterion_moco_att.py:335-338 — not reproduced)
    from moma_tpu.moma.cmo import ATTN_SETS as _ATTN_SETS

    p.add_argument("--attn", type=str, default="self",
                   choices=sorted(_ATTN_SETS))
    p.add_argument("--no_shuffle_bn", action="store_true")
    p.add_argument("--kl_teacher_bn", type=str, default="exact",
                   choices=["train", "eval", "exact"],
                   help="BN mode of the teacher's KL forward: 'exact' "
                        "(default) = the reference's real schedule (eval-BN "
                        "on each epoch's first batch — the per-epoch "
                        "model_t.eval() reset — train-BN after; two step "
                        "programs, steady one HLO-identical to 'train'), "
                        "'train' = steps>=2 steady state only, 'eval' = "
                        "running stats every step")
    p.add_argument("--fast_teacher", action="store_true",
                   help="reuse the momentum key forward for KL logits "
                        "(1 teacher fwd instead of 2; documented deviation)")
    p.add_argument("--teacher_quant", type=str, default="none",
                   choices=["none", "int8"],
                   help="run the gradient-free teacher forwards with "
                        "dynamic-int8 convs (per-batch act scales, "
                        "per-channel weight scales from the live EMA "
                        "params; documented deviation)")
    return p


def parse_student_args(argv=None) -> Config:
    """CLI mirroring train_student_moma.py:46-176 / train_student_comparison.py."""
    a = student_parser().parse_args(argv)
    cfg = _cfg_from_common(a)
    cfg.model_s = ModelConfig(name=a.model_s, pretrain=a.std_pre,
                              strict=a.std_strict)
    cfg.model_t = ModelConfig(
        name=a.model_t, pretrain=a.path_t or a.tec_pre, strict=a.tec_strict
    )
    cfg.distill = DistillConfig(
        distill=a.distill, kd_T=a.kd_T, cls=a.cls, div=a.div, beta=a.beta,
        factor=a.factor, soft=a.soft, hint_layer=a.hint_layer,
    )
    cfg.moma = MomaConfig(
        feat_dim=a.feat_dim, nce_k=a.nce_k, nce_t=a.nce_t, nce_m=a.nce_m,
        alpha=a.alpha, mem=a.mem, head=a.head, attn=a.attn, mode=a.mode,
        shuffle_bn=not a.no_shuffle_bn, fast_teacher=a.fast_teacher,
        kl_teacher_bn=a.kl_teacher_bn, teacher_quant=a.teacher_quant,
    )
    cfg = cfg.finalize()
    if a.n_cls:  # explicit flag beats the dataset table (reference behavior)
        cfg.model_s.n_cls = a.n_cls
        if cfg.model_t is not None:
            cfg.model_t.n_cls = a.n_cls
    return cfg
