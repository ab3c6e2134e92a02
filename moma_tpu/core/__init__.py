from moma_tpu.core.mesh import (
    create_mesh,
    data_sharding,
    replicated_sharding,
    local_batch_size,
)
from moma_tpu.core.schedules import lr_schedule
from moma_tpu.core.metrics import (
    Meter,
    confusion_matrix,
    macro_f1,
    accuracy_topk,
)
