"""run_moma --resume in cross-arch (EmaTec) mode: the EMA momentum encoder
must round-trip through the checkpoint (a resume without it would restart
the key encoder from epoch 0 against late-training weights)."""

import numpy as np

from moma_tpu.core.config import Config, DistillConfig, ModelConfig, MomaConfig


def test_moma_cross_arch_resume(tmp_path):
    from moma_tpu.train.moma import run_moma

    cfg = Config()
    cfg.run.save_dir = str(tmp_path)
    cfg.run.epochs = 1
    cfg.run.print_freq = 1
    cfg.data.dataset = "synthetic"
    cfg.data.batch_size = 8
    cfg.data.eval_batch_size = 8
    cfg.model_s = ModelConfig(name="resnet8", n_cls=10)
    cfg.model_t = ModelConfig(name="resnet20", n_cls=10)  # arch mismatch -> EmaTec
    cfg.distill = DistillConfig(distill="moma", cls=1.0, div=1.0, beta=1.0)
    cfg.moma = MomaConfig(feat_dim=32, nce_k=64, nce_t=0.15, alpha=0.9,
                          mem="MoCo", head="mlp", attn="self")

    import jax

    state1, res1 = run_moma(cfg, synthetic=True)
    assert state1.ema_params is not None  # cross-arch auto-selected
    leaf1 = np.asarray(jax.tree_util.tree_leaves(state1.ema_params)[0])

    cfg.run.epochs = 2
    cfg.run.resume = True
    state2, res2 = run_moma(cfg, synthetic=True)
    assert int(state2.step) == 2 * int(state1.step)
    # the restored run continued from the saved momentum encoder: after
    # epoch 2 its EMA leaves have kept moving from epoch-1's values
    leaf2 = np.asarray(jax.tree_util.tree_leaves(state2.ema_params)[0])
    assert not np.allclose(leaf2, leaf1)
    assert res2["best_acc"] >= res1["best_acc"]
