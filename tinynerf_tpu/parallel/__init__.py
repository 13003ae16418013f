from .mesh import DATA_AXIS, data_sharding, make_mesh, replicated, shard_rays

__all__ = ["DATA_AXIS", "make_mesh", "data_sharding", "replicated", "shard_rays"]
