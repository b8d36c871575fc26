from .mesh import (DATA_AXIS, DCN_AXIS, EXPERT_AXIS, batch_sharding,
                   create_mesh, init_distributed, local_batch_size,
                   replicated, shard_batch)
from .train_state import (TrainState, build_lr_schedule, build_optimizer,
                          create_train_state, path_freeze_mask)
