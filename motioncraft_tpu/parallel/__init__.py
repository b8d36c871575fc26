from .mesh import (DATA_AXIS, DCN_AXIS, EXPERT_AXIS, TENSOR_AXIS,
                   batch_sharding, create_mesh, init_distributed,
                   local_batch_size, replicated, shard_batch)
from .pp import PIPE_AXIS, gpipe, stack_block_params, unstack_block_params
from .tp import (leaf_spec, sequence_sharding, shard_batch_sp, shard_state,
                 tree_shardings)
from .train_state import (TrainState, build_lr_schedule, build_optimizer,
                          create_train_state, path_freeze_mask)
