"""Model/config archival for review and reproducibility.

TPU-native rebuild of ref model_dump/ (dump_utils.py:46 — serializes
model_fn/input_fn graphs + feature configs to proto for security review /
reload). There is no graph to serialize in JAX; the durable artifact is the
full declarative config: tables (segments with optimizer/initializer/
compressor settings), features, module structure (flax param tree shapes),
and trainer config — dumped to JSON.
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
