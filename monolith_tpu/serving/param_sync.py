"""Online parameter sync: push touched embedding rows to serving replicas.

TPU-native rebuild of ref runtime/parameter_sync/: PushRequest of delta rows
(parameter_sync.proto:20-41), `SyncClientManager` holding one client per live
target with hot target refresh (sync_client_manager.h:27-45), and
`RequestSplitter` chunking large pushes. Transport is gRPC with the codec
payloads (no codegen in this image).
"""

from __future__ import annotations

import logging
import threading
from typing import Dict, List, Optional, Sequence

import grpc
import numpy as np

from monolith_tpu.serving import codec

_METHOD_PUSH = "/monolith_tpu.ParameterSync/Push"

log = logging.getLogger(__name__)


class ParameterSyncClient:
    """Client for one serving target."""

    def __init__(self, target: str, timeout_s: float = 10.0):
        self.target = target
        self.timeout_s = timeout_s
        self._channel = grpc.insecure_channel(target)
        self._push = self._channel.unary_unary(
            _METHOD_PUSH, request_serializer=lambda b: b,
            response_deserializer=lambda b: b)

    def push(self, model_name: str, table: str, fids: np.ndarray,
             embeddings: np.ndarray, max_bytes: int = 4 << 20) -> int:
        """Chunked push (the RequestSplitter). Returns rows acked."""
        n = len(fids)
        if n == 0:
            return 0
        row_bytes = max(embeddings[0].nbytes + 8, 1)
        chunk = max(1, max_bytes // row_bytes)
        acked = 0
        for i in range(0, n, chunk):
            req = codec.pack({"model_name": model_name, "table": table,
                              "fids": np.asarray(fids[i:i + chunk], np.int64),
                              "embeddings": np.asarray(
                                  embeddings[i:i + chunk], np.float32)})
            resp = codec.unpack(self._push(req, timeout=self.timeout_s))
            acked += int(resp.get("applied", 0))
        return acked

    def close(self):
        self._channel.close()


class SyncClientManager:
    """Keeps one client per live target; targets refresh from discovery
    (ref sync_client_manager.h:27 hot-swap from ZK)."""

    def __init__(self, model_name: str, discovery=None, service: str = "serving",
                 static_targets: Sequence[str] = ()):
        self.model_name = model_name
        self.discovery = discovery
        self.service = service
        self._static = list(static_targets)
        self._clients: Dict[str, ParameterSyncClient] = {}
        self._lock = threading.Lock()

    def refresh_targets(self) -> List[str]:
        targets = list(self._static)
        if self.discovery is not None:
            targets.extend(self.discovery.query(self.service).values())
        with self._lock:
            for t in targets:
                if t not in self._clients:
                    self._clients[t] = ParameterSyncClient(t)
            for t in list(self._clients):
                if t not in targets:
                    self._clients.pop(t).close()
        return targets

    def push_routed(self, table: str, fids: np.ndarray,
                    embeddings: np.ndarray,
                    num_row_shards: int) -> Dict[str, int]:
        """Row-sharded serving push: each fid goes ONLY to the replica
        owning its row shard (replica index i serves shard
        i % num_row_shards — the same shard_of(fid, N) hash the serving
        loader and router use). The reference routes pushes per PS shard
        the same way (sync_client_manager.h targets keyed by shard)."""
        from monolith_tpu.embedding.host_store import shard_of_batch

        fids = np.asarray(fids, np.int64)
        dest = shard_of_batch(fids, num_row_shards)
        replicas: Dict[int, str] = {}
        if self.discovery is not None:
            replicas.update(self.discovery.query(self.service))
        for i, t in enumerate(self._static):
            replicas.setdefault(i, t)
        results: Dict[str, int] = {}
        with self._lock:
            for t in replicas.values():
                if t not in self._clients:
                    self._clients[t] = ParameterSyncClient(t)
            clients = dict(self._clients)
        for idx, target in replicas.items():
            sel = dest == (idx % num_row_shards)
            if not sel.any():
                results[target] = 0
                continue
            try:
                results[target] = clients[target].push(
                    self.model_name, table, fids[sel], embeddings[sel])
            except grpc.RpcError as e:
                log.warning("routed param sync push to %s failed: %s",
                            target, e)
                results[target] = -1
        return results

    def push(self, table: str, fids: np.ndarray, embeddings: np.ndarray) -> Dict[str, int]:
        """Push the delta to every live target; per-target ack counts."""
        self.refresh_targets()
        results = {}
        with self._lock:
            clients = dict(self._clients)
        for target, client in clients.items():
            try:
                results[target] = client.push(self.model_name, table, fids, embeddings)
            except grpc.RpcError as e:
                log.warning("param sync push to %s failed: %s", target, e)
                results[target] = -1
        return results
