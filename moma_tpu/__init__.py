"""moma_tpu — TPU-native knowledge-distillation framework.

A ground-up JAX/Flax/Pallas re-design of the capabilities of trinhvg/MoMA
(Momentum contrastive learning with Multi-head Attention-based knowledge
distillation; Medical Image Analysis 2024): supervised teacher training, the
MoMA momentum-queue + attention distillation method, and a 15+ member
classical KD loss zoo — built for SPMD execution over TPU device meshes.

Layout:
    core/    mesh + sharding, config tree, LR schedules, metrics, checkpoint
    models/  Flax backbone zoo with the uniform feature-list contract
    losses/  KD loss zoo as pure functions (+ trainable aux modules)
    moma/    functional MoCo queue state machine, CMO heads, batch attention
    data/    dataset manifests, host pipeline, device-side augmentation
    ops/     Pallas TPU kernels for the hot paths
    train/   TrainState variants, jitted step functions, evaluation
    cli/     entry points mirroring the reference scripts
"""

__version__ = "0.1.0"
