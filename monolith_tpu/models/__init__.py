from monolith_tpu.models.deepfm import DeepFMModule, DeepFMTask
