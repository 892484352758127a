from .sharded import ShardedHnsw, default_mesh, sharded_insert_round_fn

__all__ = ["ShardedHnsw", "default_mesh", "sharded_insert_round_fn"]
