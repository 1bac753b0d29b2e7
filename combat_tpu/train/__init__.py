from .loop import (
    dequantize,
    epoch_permutation,
    eval_epoch,
    gather_batch,
    metrics_to_host,
    padded_eval_batches,
    train_epoch_alternated,
    train_epoch_classifier,
)
from .mesh import batch_sharding, channel_sharding, make_mesh, make_mesh_2d, replicate, replicated, shard_batch
from .schedules import multistep_lr, multistep_lr_resume, sgd_torch
from .state import FrozenModel, TrainState, init_frozen, init_train_state
from .steps import (
    cross_entropy,
    make_alternated_train_step,
    make_attack_eval_step,
    make_clean_eval_step,
    make_clean_train_step,
    make_victim_eval_step,
    make_victim_train_step,
)
