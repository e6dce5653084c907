from monolith_tpu.parallel.mesh import make_mesh
from monolith_tpu.parallel.sharded import ShardedTrainer
