from audio_training_tpu.ops.pallas.melspec import fused_power_mel

__all__ = ["fused_power_mel"]
