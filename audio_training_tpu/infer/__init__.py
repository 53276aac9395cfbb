from audio_training_tpu.infer.fused import make_fused_infer_fn

__all__ = ["make_fused_infer_fn"]
