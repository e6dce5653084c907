from monolith_tpu.embedding.host_store import Batcher, FilterKind, HostStore, shard_of
