from .mesh import make_mesh, shard_jet_batch, sharded_jet_step
