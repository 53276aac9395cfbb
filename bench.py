"""Benchmark: fused waveform -> mel -> PCEN -> badwinner2-logits inference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 50 000 audio-seconds/sec/chip (BASELINE.md).  Each clip is
3 s of 48 kHz audio at the production geometry (NFFT 4096, hop 281, 160 mels,
513 frames).
"""

from __future__ import annotations

import json
import time

import numpy as np

TARGET = 50_000.0  # audio-seconds/sec/chip (BASELINE.json north star)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from audio_training_tpu.config import FeaturizerConfig
    from audio_training_tpu.infer.fused import make_fused_infer_fn
    from audio_training_tpu.models import build_model

    cfg = FeaturizerConfig()
    num_labels = 62  # reference production label count (labelstoebird.py)
    batch = 128

    spec = build_model(
        "badwinner2", num_labels=num_labels, logits_only=True,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    mel0 = jnp.zeros((1, cfg.n_mels, cfg.mel_frames, 1), jnp.float32)
    variables = spec.module.init({"params": jax.random.PRNGKey(0)}, mel0,
                                 train=False)
    infer = make_fused_infer_fn(
        spec.module, variables, cfg, use_pcen=True, use_pallas=True,
    )

    raw = jnp.asarray(
        rng.standard_normal((batch, cfg.samples_per_clip)).astype(np.float32)
    )
    # warmup / compile
    out = infer(raw)
    out.block_until_ready()

    # timed
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(raw)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    clips_per_s = batch * iters / dt
    audio_s_per_s = clips_per_s * cfg.segment_length
    print(
        json.dumps(
            {
                "metric": "audio-seconds/sec/chip (mel+PCEN+CNN infer)",
                "value": round(audio_s_per_s, 1),
                "unit": "audio_s/s/chip",
                "vs_baseline": round(audio_s_per_s / TARGET, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
