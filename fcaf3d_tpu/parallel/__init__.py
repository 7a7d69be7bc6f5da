from .mesh import data_mesh, shard_batch, replicate  # noqa: F401
