"""monolith_tpu: a TPU-native large-scale recommendation training & serving framework.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of bytedance/monolith:
collisionless embedding tables with per-ID optimizer state, admission/eviction,
batch + realtime streaming training, sharded checkpointing with incremental
deltas, and online parameter sync to serving — designed SPMD-first over
`jax.sharding.Mesh` with XLA collectives instead of parameter servers.
"""

__version__ = "0.1.0"
