from moma_tpu.train.state import DistillState, MomaState, TrainState, make_sgd
from moma_tpu.train.steps import make_eval_step, make_vanilla_train_step
from moma_tpu.train.teacher import run_teacher
from moma_tpu.train.student import run_student
