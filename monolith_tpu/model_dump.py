"""Model/config archival for review and reproducibility.

TPU-native rebuild of ref model_dump/ (dump_utils.py:46 — serializes
model_fn/input_fn graphs + feature configs to proto for security review /
reload). Two artifacts:

1. The declarative config (dump_model/save_model_dump): tables, features,
   module param shapes, trainer config — JSON.
2. The actual COMPUTE GRAPH (dump_graph/save_graph_dump): the jitted
   forward step lowered to StableHLO text — the JAX analogue of the
   reference's archived tf.GraphDef. It is the exact program the compiler
   receives, diffable across code changes and independently auditable
   (a reviewer needs no access to the Python that built it).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict

import jax


def _dc_to_dict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        out = {"__class__": type(obj).__name__}
        for f in dataclasses.fields(obj):
            out[f.name] = _dc_to_dict(getattr(obj, f.name))
        return out
    if isinstance(obj, (list, tuple)):
        return [_dc_to_dict(x) for x in obj]
    if isinstance(obj, dict):
        return {k: _dc_to_dict(v) for k, v in obj.items()}
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return repr(obj)


def dump_model(trainer) -> Dict:
    """Build the archival dict for a trainer (call json.dump on it)."""
    task = trainer.task
    dump = {
        "task": type(task).__name__,
        "task_config": _dc_to_dict(task) if dataclasses.is_dataclass(task)
        else repr(task),
        "tables": {name: _dc_to_dict(spec)
                   for name, spec in trainer.engine.tables.items()},
        "features": {name: _dc_to_dict(f)
                     for name, f in trainer.engine.features.items()},
        "engine_config": _dc_to_dict(trainer.config.engine),
        "step": trainer.step,
    }
    if trainer.params is not None:
        shapes = jax.tree.map(lambda x: list(x.shape), trainer.params)
        dump["dense_param_shapes"] = jax.tree.map(
            lambda x: x, shapes)
        dump["dense_param_count"] = int(sum(
            x.size for x in jax.tree.leaves(trainer.params)))
    return dump


def save_model_dump(trainer, path: str) -> None:
    with open(path, "w") as f:
        json.dump(dump_model(trainer), f, indent=2, default=repr)


def dump_graph(trainer, fid_batch, batch, ts: int = 0) -> str:
    """Lower the trainer's forward step on a representative batch and
    return its StableHLO text (ref dump_utils.py graph archival). Pure
    tracing — no device execution, no state mutation."""
    import jax.numpy as jnp

    engine, module = trainer.engine, trainer.module
    inputs, _ = engine.prepare_batch(fid_batch, ts=ts)
    trainer._maybe_init(inputs, batch)

    def forward(table_states, params, model_state, inputs, batch):
        pooled, _ = engine.embed(table_states, inputs)
        out, _ = trainer._apply(params, model_state, pooled, batch,
                                training=False)
        return trainer.task.predictions(out)

    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    lowered = jax.jit(forward).lower(trainer.table_states, trainer.params,
                                     trainer.model_state, inputs, batch_j)
    return lowered.as_text()


def save_graph_dump(trainer, path: str, fid_batch, batch,
                    ts: int = 0) -> None:
    with open(path, "w") as f:
        f.write(dump_graph(trainer, fid_batch, batch, ts=ts))
