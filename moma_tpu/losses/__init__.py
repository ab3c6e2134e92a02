"""KD loss zoo — pure functions over (student, teacher) features/logits.

Functional re-design of the reference's `distiller_zoo/` nn.Module losses
and `crd/`.  Stateless losses are plain functions; losses with trainable
auxiliaries (ConvReg/SelfA/SRRL/SimKD/CRD embeds) pair a Flax module in
`moma_tpu.losses.aux` with a loss function here.

Loss-combination contract (reference helper/loops_moma.py:350):
    total = cls * CE + div * KL + beta * loss_kd
"""

from moma_tpu.losses.functional import (
    cross_entropy,
    kd_kl,
    hint_mse,
    attention_transfer,
    similarity_preserving,
    rkd_loss,
    pkt_loss,
    nst_loss,
    cc_loss,
    fsp_loss,
    ft_loss,
    ab_loss,
    kdsvd_loss,
)
