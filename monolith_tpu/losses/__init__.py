from monolith_tpu.losses.losses import (batch_softmax_loss, bce_with_logits,
                                        inbatch_auc_loss)
