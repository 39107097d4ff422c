from fvc.dist.mesh import make_mesh, frames_spec, replicated, shard_batch
