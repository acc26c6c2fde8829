from .mesh import data_mesh, make_predict_fn, shard_batch_spec

__all__ = ["data_mesh", "make_predict_fn", "shard_batch_spec"]
