"""Benchmark: fused waveform -> mel -> badwinner2-logits inference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 50 000 audio-seconds/sec/chip (BASELINE.md).  Each clip is
3 s of 48 kHz audio at the production geometry (NFFT 4096, hop 281, 160 mels,
513 frames).

The chain is the production badwinner2 inference path (reference
tfdataset.py:481-498 order: per-clip waveform min-max normalize ->
raw_to_mel -> model; PCEN is the pretrained-backbone frontend, NOT part of
the badwinner2 chain — badwinner2's MagTransform ``x**sigmoid(a)`` NaNs on
the PCEN layer's [-1, 1] output in this framework AND in the TF reference).
The featurizer is the fully-fused Pallas kernel
(ops/pallas/fused_featurizer.py): framing -> two-stage matmul-DFT -> power
-> mel in VMEM, one kernel per batch.  ``BENCH_FEAT_PRECISION``
selects its dot precision: "default" (bf16 MXU dots, ~2e-3 mel error — the
same numeric class as the bf16 CNN that consumes the image) or "highest"
(exact f32 parity with the reference featurizer, 1.96e-7 on-chip, ~15 ms
more per 256-clip batch).  Parity evidence for both tiers is recorded in
docs/PERFORMANCE.md and tests/test_fused_featurizer.py.

Measurement notes (see .claude/skills/verify/SKILL.md): the axon relay
result-caches identical calls and executes lazily past block_until_ready, so
the timed region chains ITERS steps inside ONE jit via lax.scan with
step-dependent inputs and is synchronized by a scalar host fetch.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

TARGET = 50_000.0  # audio-seconds/sec/chip (BASELINE.json north star)
BATCH = 256
ITERS = 8


def main() -> None:
    import jax

    # Remote compiles through the tunnel are 30s-15min with high variance;
    # the persistent cache makes bench reruns deterministic-fast.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from audio_training_tpu.config import FeaturizerConfig
    from audio_training_tpu.models import build_model
    from audio_training_tpu.ops.features import build_mel_weights, normalize_rows
    from audio_training_tpu.ops.pallas.fused_featurizer import FusedFeaturizer

    cfg = FeaturizerConfig()
    num_labels = 62  # reference production label count (labelstoebird.py)
    precision = os.environ.get("BENCH_FEAT_PRECISION", "default")

    fz = FusedFeaturizer(
        build_mel_weights(cfg), cfg.n_fft, cfg.hop_length,
        precision=precision,
    )
    spec = build_model(
        "badwinner2", num_labels=num_labels, logits_only=True,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    mel0 = jnp.zeros((1, cfg.n_mels, cfg.mel_frames, 1), jnp.float32)
    variables = spec.module.init({"params": jax.random.PRNGKey(0)}, mel0,
                                 train=False)

    def full(raw):
        img = fz(normalize_rows(raw), pcen=False)[..., None]
        return spec.module.apply(variables, img, train=False)

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
                "metric": "audio-seconds/sec/chip (badwinner2 e2e infer)",
                "value": round(audio_s_per_s, 1),
                "unit": "audio_s/s/chip",
                "vs_baseline": round(audio_s_per_s / TARGET, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
