"""SimKD evaluation path: student scored through the reused teacher
classifier (reference loops_moma.py:481-487)."""

import jax
import jax.numpy as jnp
import numpy as np

from moma_tpu.core.mesh import create_mesh
from moma_tpu.data.augment import cifar_eval_normalize
from moma_tpu.data.pipeline import Loader, synthetic_dataset
from moma_tpu.train.distill import make_simkd_eval_step
from moma_tpu.train.loop import evaluate
from tests.test_distill import _setup


def test_simkd_eval_runs(mesh8):
    cfg, distiller, state = _setup("simkd", mesh8)
    # build the eval step from the distill state's teacher
    from moma_tpu.models import create_model

    student = create_model("resnet8", num_classes=10)
    eval_step = make_simkd_eval_step(
        student, distiller, state.teacher_params, state.teacher_batch_stats,
        n_cls=10, normalize_fn=cifar_eval_normalize,
    )
    ds = synthetic_dataset(20, 32, 10, seed=3)
    loader = Loader(ds, batch_size=16, train=False)
    stats = evaluate(
        state.params, state.batch_stats, loader, eval_step, mesh8, 10
    )
    assert stats["n"] == 20
    assert np.isfinite(stats["loss"])
    assert 0 <= stats["acc"] <= 100
