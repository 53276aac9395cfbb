from audio_training_tpu.utils.logging import init_logging

__all__ = ["init_logging"]
