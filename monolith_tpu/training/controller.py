"""Live training control + debugging service.

TPU-native rebuild of the reference's per-worker controller gRPC service
(hooks/server/server_lib.py:32-73 ControllerServicer/ServerHook —
StopTraining/ResumeTraining/SaveCheckpoint/GetTrainingStatus on the live
session) merged with the debugging server (debugging/debugging_server.py —
query live table stats): one gRPC service bound to a running trainer through
a hook.

Usage:
    ctl = TrainingController(trainer, ckpt_dir=...)
    addr = ctl.start()          # gRPC server
    trainer.train(data, hooks=[ctl.hook])
"""

from __future__ import annotations

import threading
import time
from concurrent import futures
from typing import Dict, Optional

import grpc

from monolith_tpu.serving import codec
from monolith_tpu.training.hooks import machine_info
from monolith_tpu.utils.metrics_client import get_metric_client

_SERVICE = "monolith_tpu.TrainingController"


class _Handler(grpc.GenericRpcHandler):
    def __init__(self, ctl):
        self._ctl = ctl

    def service(self, hcd):
        name = hcd.method.rsplit("/", 1)[-1]
        fn = {
            "StopTraining": self._ctl._rpc_stop,
            "ResumeTraining": self._ctl._rpc_resume,
            "SaveCheckpoint": self._ctl._rpc_save,
            "GetTrainingStatus": self._ctl._rpc_status,
            "GetBlockStatus": self._ctl._rpc_status,
        }.get(name)
        if fn is None or not hcd.method.startswith(f"/{_SERVICE}/"):
            return None
        return grpc.unary_unary_rpc_method_handler(
            fn, request_deserializer=lambda b: b,
            response_serializer=lambda b: b)


class TrainingController:
    def __init__(self, trainer, ckpt_dir: Optional[str] = None, port: int = 0):
        self.trainer = trainer
        self.ckpt_dir = ckpt_dir
        self._paused = threading.Event()
        self._save_requested = threading.Event()
        self._server = grpc.server(futures.ThreadPoolExecutor(max_workers=4))
        self._server.add_generic_rpc_handlers((_Handler(self),))
        self.port = self._server.add_insecure_port(f"[::]:{port}")
        self.addr = f"localhost:{self.port}"

    # --- rpc impls ---

    def _rpc_stop(self, request, context):
        self._paused.set()
        return codec.pack({"ok": 1, "paused": 1})

    def _rpc_resume(self, request, context):
        self._paused.clear()
        return codec.pack({"ok": 1, "paused": 0})

    def _rpc_save(self, request, context):
        if self.ckpt_dir is None:
            return codec.pack({"ok": 0, "error": "no ckpt_dir configured"})
        self._save_requested.set()
        return codec.pack({"ok": 1})

    def _rpc_status(self, request, context):
        t = self.trainer
        # metrics accumulate on device; a status RPC is an explicit user
        # request, so the one readback here is acceptable
        try:
            t._drain_metrics()
        except Exception:
            pass
        status: Dict = {"step": t.step,
                        "paused": int(self._paused.is_set()),
                        "loss": float(t.loss_mean.result()),
                        "auc": float(t.auc.result())}
        for tname, stores in t.engine.stores.items():
            for s, store in enumerate(stores):
                status[f"table:{tname}:s{s}:size"] = store.size()
        info = machine_info()
        for k in ("load1", "mem_available_kb"):
            if k in info:
                status[f"machine:{k}"] = info[k]
        snap = get_metric_client().snapshot()
        for k, v in snap["stores"].items():
            status[f"metric:{k}"] = v
        return codec.pack(status)

    # --- trainer-side hook ---

    def hook(self, trainer, out):
        """Install as a training hook: honors pause + save requests between
        steps (the reference's barrier quiesce, barrier_ops.py)."""
        if self._save_requested.is_set():
            from monolith_tpu.training import checkpoint
            checkpoint.save(trainer, self.ckpt_dir)
            self._save_requested.clear()
        while self._paused.is_set():
            time.sleep(0.05)

    # --- lifecycle ---

    def start(self) -> str:
        self._server.start()
        return self.addr

    def stop(self):
        self._server.stop(grace=0.5)


class ControllerClient:
    """ref hooks/server client side."""

    def __init__(self, target: str, timeout_s: float = 10.0):
        self.timeout_s = timeout_s
        ch = grpc.insecure_channel(target)
        mk = lambda m: ch.unary_unary(f"/{_SERVICE}/{m}",
                                      request_serializer=lambda b: b,
                                      response_deserializer=lambda b: b)
        self._stop = mk("StopTraining")
        self._resume = mk("ResumeTraining")
        self._save = mk("SaveCheckpoint")
        self._status = mk("GetTrainingStatus")
        self._channel = ch

    def stop_training(self):
        return codec.unpack(self._stop(codec.pack({}), timeout=self.timeout_s))

    def resume_training(self):
        return codec.unpack(self._resume(codec.pack({}), timeout=self.timeout_s))

    def save_checkpoint(self):
        return codec.unpack(self._save(codec.pack({}), timeout=self.timeout_s))

    def get_status(self) -> Dict:
        return codec.unpack(self._status(codec.pack({}), timeout=self.timeout_s))

    def close(self):
        self._channel.close()
