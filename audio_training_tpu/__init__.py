"""audio_training_tpu — TPU-native bioacoustics training & inference.

A ground-up JAX/XLA/Pallas/pjit framework with the capabilities of
TheCacophonyProject/audio-training (reference mounted at /root/reference):
corpus ingestion, dataset building, a fused on-device input pipeline, CNN
model families (badwinner2, wide-resnets, backbones with PCEN frontends),
a pjit data-parallel training harness, evaluation/confusion tooling,
sliding-window long-recording inference with energy-based track detection,
deployment freezing, and eBird geo-grid metadata.
"""

__version__ = "0.1.0"
