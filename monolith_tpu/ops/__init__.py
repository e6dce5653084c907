from monolith_tpu.ops.interactions import (dot_interaction, ffm_interaction,
                                           fm_interaction)
from monolith_tpu.ops.clip import clip_by_global_norm, global_norm
from monolith_tpu.ops.insight import feature_insight, fid_counter
from monolith_tpu.ops.seq import gen_seq_mask
