from moma_tpu.moma.queue import QueueState, queue_logits, queue_update
from moma_tpu.moma.cmo import CMOHeads, BatchTokenAttention
