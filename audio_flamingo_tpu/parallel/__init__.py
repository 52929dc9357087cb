from audio_flamingo_tpu.parallel.mesh import MeshPlan, make_mesh
from audio_flamingo_tpu.parallel.sharding import shard_params, param_specs

__all__ = ["MeshPlan", "make_mesh", "shard_params", "param_specs"]
