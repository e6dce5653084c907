from monolith_tpu.embedding.host_store import Batcher, FilterKind, HostStore, shard_of
from monolith_tpu.embedding import compressors, initializers, optimizers, spec, table
from monolith_tpu.embedding.spec import (
    AdmissionConfig, Constant, EvictionConfig, PolynomialDecay, TableSegment,
    TableSpec, WarmupSchedule)
