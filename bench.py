"""Benchmark: fused waveform -> mel -> PCEN -> badwinner2-logits inference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 50 000 audio-seconds/sec/chip (BASELINE.md).  Each clip is
3 s of 48 kHz audio at the production geometry (NFFT 4096, hop 281, 160 mels,
513 frames).

Measurement notes (see .claude/skills/verify/SKILL.md): the axon relay
result-caches identical calls and executes lazily past block_until_ready, so
the timed region chains ITERS steps inside ONE jit via lax.scan with
step-dependent inputs and is synchronized by a scalar host fetch.
"""

from __future__ import annotations

import json
import time

import numpy as np

TARGET = 50_000.0  # audio-seconds/sec/chip (BASELINE.json north star)
BATCH = 256
ITERS = 8


def main() -> None:
    import jax
    import jax.numpy as jnp

    from audio_training_tpu.config import FeaturizerConfig
    from audio_training_tpu.models import build_model
    from audio_training_tpu.ops.featurizer_select import make_mel_fn
    from audio_training_tpu.ops.pcen import pcen

    cfg = FeaturizerConfig()
    num_labels = 62  # reference production label count (labelstoebird.py)

    mel_fn = make_mel_fn(cfg, backend="auto")
    spec = build_model(
        "badwinner2", num_labels=num_labels, logits_only=True,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    mel0 = jnp.zeros((1, cfg.n_mels, cfg.mel_frames, 1), jnp.float32)
    variables = spec.module.init({"params": jax.random.PRNGKey(0)}, mel0,
                                 train=False)

    def full(raw):
        mel = mel_fn(raw)  # (B, M, T)
        p = pcen(mel, time_axis=2)
        return spec.module.apply(variables, p[..., None], train=False)

    @jax.jit
    def run(raw0):
        def step(carry, i):
            raw = carry + i.astype(jnp.float32) * 1e-6
            return raw, full(raw).sum()
        _, sums = jax.lax.scan(step, raw0, jnp.arange(ITERS))
        return sums.sum()

    raw = jnp.asarray(
        rng.standard_normal((BATCH, cfg.samples_per_clip)).astype(np.float32)
    )
    float(run(raw))  # compile + warm
    t0 = time.perf_counter()
    float(run(raw))  # host fetch of the scalar forces the whole chain
    dt = time.perf_counter() - t0

    clips_per_s = BATCH * ITERS / dt
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
