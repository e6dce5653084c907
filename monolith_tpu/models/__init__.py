from monolith_tpu.models.deepfm import DeepFMModule, DeepFMTask
from monolith_tpu.models.din import DINModule, DINTask
from monolith_tpu.models.ffm import FFMModule, FFMTask
from monolith_tpu.models.multitask import MMoEModule, MMoETask
from monolith_tpu.models.multislot import MultiSlotModule, MultiSlotTask
from monolith_tpu.models.dcn import DCNModule, DCNTask
from monolith_tpu.models.autoint import AutoIntModule, AutoIntTask
from monolith_tpu.models.movie_ranking import (MovieRankingModule,
                                                MovieRankingTask)
