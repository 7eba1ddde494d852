from .mesh import create_mesh, shard_batch, replicate
from .dist import (init_distributed, is_main_process,
                   local_batch_to_global, gather_results)
from .train import (TrainState, build_optimizer, build_lr_schedule,
                    create_train_state, make_train_step, make_eval_step)
