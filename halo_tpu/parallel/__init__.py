from .mesh import (create_mesh, batch_sharding, replicated, shard_batch,
                   replicate_tree)
