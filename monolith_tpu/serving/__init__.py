from monolith_tpu.serving.export import export_model
from monolith_tpu.serving.engine import ServingModel
from monolith_tpu.serving.discovery import FileDiscovery, ServiceDiscovery
from monolith_tpu.serving.agent import ServingAgent, ServingClient, VersionWatcher
from monolith_tpu.serving.param_sync import (ParameterSyncClient,
                                             SyncClientManager)
