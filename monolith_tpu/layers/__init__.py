from monolith_tpu.layers.mlp import MLP
from monolith_tpu.layers.cross import CrossNet, CIN
from monolith_tpu.layers.dense import AddBias, Dense
from monolith_tpu.layers.feature_cross import FFM, CAN, CDot, DCN, AllInt, GroupInt
from monolith_tpu.layers.feature_trans import AutoInt, SeNet, iRazor
from monolith_tpu.layers.feature_seq import DIEN, DIN, DMR_U2I
from monolith_tpu.layers.agru import AGRUCell, AUGRU, GRU, GRUCell
from monolith_tpu.layers.multi_task import MMoE, SNR
from monolith_tpu.layers.lhuc import LHUCTower
from monolith_tpu.layers.logit_correction import LogitCorrection, logit_correction
from monolith_tpu.layers.norms import BatchNorm, GradNorm, LayerNorm, grad_norms_wrt
from monolith_tpu.layers.pooling import (AvgPooling, MaxPooling, SumPooling,
                                         avg_pooling, max_pooling, sum_pooling)
from monolith_tpu.layers import activations
