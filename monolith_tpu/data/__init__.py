from monolith_tpu.data.synthetic import SyntheticCTR
