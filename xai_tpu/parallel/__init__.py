from .mesh import make_mesh, shard_batch, replicate
from .sharded_eval import sharded_eval_step, make_sharded_train_step

__all__ = ["make_mesh", "shard_batch", "replicate", "sharded_eval_step",
           "make_sharded_train_step"]
