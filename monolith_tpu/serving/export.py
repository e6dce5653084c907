"""Model export for serving.

TPU-native rebuild of ref model_export/ (StandaloneExporter/
DistributedExporter saved_model_exporters.py:510,571, ExportContext
export_context.py:26). There is no graph format to export — the serving
"graph" is the task's flax module + the framework's lookup path — so an
export is: dense params, per-(table, shard) row dumps with the host id->row
maps, and metadata. Per-segment serving compressors (ref
runtime/hash_table/compressor/float_compressor.cc) are applied column-wise
at export; ServingModel decompresses on load.

Layout:
    <dir>/export-<step>/
        meta.json
        dense.msgpack
        tables/<table>-s<k>.npz     fids + per-segment compressed blobs
    <dir>/EXPORT                    latest step pointer
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import numpy as np
from flax import serialization


def export_model(trainer, directory: str, step: Optional[int] = None) -> str:
    """Export trainer state for serving; returns export path.

    Works on every trainer topology: single-device, sharded, and
    MultiHostTrainer. In multi-process runs each process exports ONLY its
    own table shards (globally-sharded pools are not addressable across
    processes), process 0 writes the dense params + metadata, and all
    processes barrier before the EXPORT pointer lands — the reference's
    DistributedExporter writes per-PS shard dumps the same way
    (saved_model_exporters.py:571)."""
    step = trainer.step if step is None else step
    path = os.path.join(directory, f"export-{step}")
    multiproc = jax.process_count() > 1
    proc0 = jax.process_index() == 0
    os.makedirs(os.path.join(path, "tables"), exist_ok=True)

    if proc0:
        with open(os.path.join(path, "dense.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(trainer.params)))
        if getattr(trainer, "model_state", None):
            with open(os.path.join(path, "model_state.msgpack"), "wb") as f:
                f.write(serialization.to_bytes(
                    jax.device_get(trainer.model_state)))

    from monolith_tpu.embedding import table as table_lib
    from monolith_tpu.training.checkpoint import _shard_data

    meta = {"step": step, "ts": int(time.time()), "tables": {}}
    for tname, spec in trainer.engine.tables.items():
        state = trainer.table_states[tname]
        num_shards = jax.tree.leaves(state)[0].shape[0]
        seg_meta = [{"dim": s.dim, "compressor": s.compressor.name}
                    for s in spec.segments]
        meta["tables"][tname] = {"shards": num_shards, "dim": spec.dim,
                                 "capacity_per_shard": spec.capacity_per_shard,
                                 "segments": seg_meta}
        local = getattr(trainer, "local_device_ids", None)
        shard_ids = (list(local) if multiproc and local is not None
                     else range(num_shards))
        for s in shard_ids:
            store = trainer.engine.stores[tname][s]
            fids, rows, _, _ = store.save()
            # export only live rows, in fid order, compressed per segment
            shard_state = jax.tree.map(
                lambda x: _shard_data(x, s)
                if not getattr(x, "is_fully_addressable", True)
                else np.asarray(x[s]), state)
            pool = table_lib.params_np(spec, shard_state)
            live = pool[rows] if len(rows) else np.zeros((0, spec.dim), np.float32)
            arrays = {"fids": fids}
            off = 0
            for i, seg in enumerate(spec.segments):
                vals = live[:, off:off + seg.dim]
                if seg.retriever is not None:
                    # bake quantization-aware retrieval into the export so
                    # serving sees the same values training retrieved (ref
                    # retriever bound into the serving entry accessor)
                    vals = np.asarray(seg.retriever.retrieve(vals, step),
                                      dtype=np.float32)
                blob = seg.compressor.compress(vals)
                for k, v in blob.items():
                    arrays[f"seg{i}:{k}"] = np.asarray(v)
                off += seg.dim
            np.savez(os.path.join(path, "tables", f"{tname}-s{s}.npz"), **arrays)

    if proc0:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
    if multiproc:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(f"mt_export_{step}")
    if proc0:
        with open(os.path.join(directory, "EXPORT"), "w") as f:
            f.write(str(step))
    if multiproc:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(f"mt_export_done_{step}")
    return path


def write_warmup_data(export_path: str, fid_batches, batches=None,
                      filename: str = "warmup.rec") -> str:
    """Write sample predict payloads next to an export (ref
    model_export/data_gen_utils.py warmup-data generation) so serving can
    pre-trace/pre-compile before taking traffic. Each record is a codec
    payload in the same framing used by the agent's Predict method."""
    import numpy as np

    from monolith_tpu.data.framing import RecordWriter
    from monolith_tpu.serving import codec

    path = os.path.join(export_path, filename)
    batches = batches or [{} for _ in fid_batches]
    with open(path, "wb") as f:
        w = RecordWriter(f)
        for fid_batch, batch in zip(fid_batches, batches):
            payload = {f"fid:{k}": np.asarray(v, np.int64)
                       for k, v in fid_batch.items()}
            for k, v in (batch or {}).items():
                payload[f"batch:{k}"] = np.asarray(v)
            w.write(codec.pack(payload))
    return path


def read_warmup_data(export_path: str, filename: str = "warmup.rec"):
    """Yield (fid_batch, batch) pairs from a warmup file."""
    from monolith_tpu.data.framing import RecordReader
    from monolith_tpu.serving import codec

    with open(os.path.join(export_path, filename), "rb") as f:
        for _, payload in RecordReader(f):
            req = codec.unpack(payload)
            fid_batch = {k[4:]: v for k, v in req.items() if k.startswith("fid:")}
            batch = {k[6:]: v for k, v in req.items() if k.startswith("batch:")}
            yield fid_batch, batch


def latest_export(directory: str) -> Optional[str]:
    p = os.path.join(directory, "EXPORT")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        step = int(f.read().strip())
    return os.path.join(directory, f"export-{step}")
