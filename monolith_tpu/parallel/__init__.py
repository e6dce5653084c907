from monolith_tpu.parallel.mesh import make_mesh
from monolith_tpu.parallel.sharded import ShardedTrainer
from monolith_tpu.parallel.multihost import MultiHostTrainer
