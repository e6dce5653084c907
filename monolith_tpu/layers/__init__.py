from monolith_tpu.layers.mlp import MLP
from monolith_tpu.layers.cross import CrossNet, CIN
