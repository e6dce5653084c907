from monolith_tpu.training.task import RecTask
from monolith_tpu.training.trainer import Trainer, TrainerConfig
