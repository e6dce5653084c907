from monolith_tpu.optimizers.dense import adamom, adamom_v2, rmsprop_v2, shampoo
