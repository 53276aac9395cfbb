"""The H-tiled conv1->conv2->pool megakernel probe (VERDICT r4 #4).

Measures, on the attached TPU chip:
  (a) Mosaic sustained bf16 dot throughput at every candidate conv2
      formulation shape:
        - W-in-lanes:  A=(64 cout, K taps) @ B=(K, 512 w-lanes)
        - im2col:      A=(512 w, K taps)   @ B=(K, 64|128 cout)
        - batch-in-lanes (XLA's own conv layout {0,3,2,1}):
                       A=(64|128 cout-rows, K) @ B=(K, 128|256 batch-lanes)
        - square reference
      under three operand/accumulation patterns: rotating-A + one store
      per dot ("store", the real kernel's one-K-complete-dot-per-output-
      tile shape), rotating-A + VMEM read-modify-write ("accum"), and
      stationary-weights/rotating-patches ("brot", the exact operand
      pattern of a conv kernel with resident weights).
  (b) the VPU cost of unaligned lane slices (dw-shift patch assembly of
      the W-in-lanes form), aligned sublane-block copies (ring-buffer
      K-assembly of the batch-in-lanes form), and stride-3 lane
      compaction (the 3x3/3 maxpool tail of the W-in-lanes form).

These bound the achievable megakernel time against XLA's measured
conv1+conv2+pool stack (5.10 + 12.28 + 6.94 ms at B=256,
docs/PERFORMANCE.md round 3).  Measured 2026-08-20 (TPU v5 lite, axon
relay) — the numbers that closed the direction
(docs/PERFORMANCE.md round 5):

    dot[store] M=  64 K= 640 N= 512:  57.4 TFLOP/s  ( 730 ns/dot)
    dot[store] M= 128 K= 640 N= 512:  60.7 TFLOP/s  (1381 ns/dot)
    dot[store] M= 256 K= 640 N= 512:  64.8 TFLOP/s  (2588 ns/dot)
    dot[store] M= 512 K= 512 N= 512:  83.6 TFLOP/s  (3212 ns/dot)
    dot[store] M= 512 K= 640 N= 128:  58.6 TFLOP/s  (1432 ns/dot)
    dot[store] M=  64 K= 640 N= 128:  37.6 TFLOP/s  ( 279 ns/dot)
    dot[store] M=  64 K= 640 N= 256:  46.7 TFLOP/s  ( 449 ns/dot)
    dot[store] M= 128 K= 768 N= 128:  53.8 TFLOP/s  ( 467 ns/dot)
    dot[accum] M=  64 K= 640 N= 512:  54.8 TFLOP/s
    dot[brot ] M=  64 K= 640 N= 512:  60.6 TFLOP/s
    dot[brot ] M= 512 K= 512 N= 512:  91.4 TFLOP/s
    shift1  (64x640):  269.1 ns/op      roll (64x640):  267.6 ns/op
    copyblk (256x128): 105.8 ns/op
    pool3 stride-3 lane compaction: DOES NOT LOWER (Mosaic gather
    "Shape mismatch in input, indices and output")

Relay rules: every timed region chains work inside ONE jit; the
kernel's fori_loop rotates among 4 operand variants by loop index
(defeats invariant hoisting WITHOUT a serializing scalar dependency —
dots stay pipelineable, like a real conv kernel's accumulation) and a
per-scan-step SMEM salt defeats CSE and the relay result cache; sync by
scalar host fetch; min-of-3.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python docs/probes/probe_megakernel.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

ITERS = 16
REPEATS = 3


def timed(run, *args):
    float(run(*args))
    dt = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(run(*args))
        dt = min(dt, time.perf_counter() - t0)
    return dt


# ---------------------------------------------------------------- dot rate
def dot_kernel(salt_ref, a_ref, b_ref, out_ref, acc, *, ndots, mode):
    # acc is (SLOTS, m, n); slot rotation = pure stores (the real conv
    # kernel's pattern: ONE K-complete dot per output tile, MXU-internal
    # accumulation, one store) vs "accum" = VMEM read-modify-write.
    acc[0] = jnp.full_like(acc[0], salt_ref[0] * 1e-30)

    def body(i, _):
        if mode == "brot":
            # real-kernel operand pattern: stationary weights A, varying
            # activation patches B (b_ref here is (4, k, n))
            d = jnp.dot(a_ref[0], b_ref[i % 4],
                        preferred_element_type=jnp.float32)
        else:
            d = jnp.dot(a_ref[i % 4], b_ref[:],
                        preferred_element_type=jnp.float32)
        if mode == "accum":
            acc[0] += d
        else:
            acc[(i % 8)] = d
        return 0

    jax.lax.fori_loop(0, ndots, body, 0)
    n = acc.shape[-1]
    out_ref[:, : min(n, 128)] = acc[0, :8, : min(n, 128)]


def bench_dot(m, k, n, ndots, grid=8, mode="store"):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((4, m, k)), jnp.bfloat16)
    bshape = (4, k, n) if mode == "brot" else (k, n)
    b = jnp.asarray(rng.standard_normal(bshape), jnp.bfloat16)
    slots = 1 if mode == "accum" else 8

    call = pl.pallas_call(
        functools.partial(dot_kernel, ndots=ndots, mode=mode),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((4, m, k), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            (pl.BlockSpec((4, k, n), lambda g: (0, 0, 0),
                          memory_space=pltpu.VMEM)
             if mode == "brot" else
             pl.BlockSpec((k, n), lambda g: (0, 0),
                          memory_space=pltpu.VMEM)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((slots, m, n), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((8 * grid, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * m * k * n) * ndots * grid,
            bytes_accessed=(4 * m * k + k * n) * 2,
            transcendentals=0,
        ),
    )

    @jax.jit
    def run(a, b):
        def step(_, i):
            salt = jnp.reshape(i.astype(jnp.float32) * 1e-30, (1,))
            return None, call(salt, a, b).sum()
        _, sums = jax.lax.scan(step, None, jnp.arange(ITERS))
        return sums.sum()

    dt = timed(run, a, b)
    fl = 2.0 * m * k * n * ndots * grid * ITERS
    tf = fl / dt / 1e12
    per_dot_ns = dt / (ndots * grid * ITERS) * 1e9
    print(f"dot[{mode:5s}] M={m:4d} K={k:4d} N={n:4d}: {dt*1e3:8.2f} ms "
          f"total -> {tf:7.1f} TFLOP/s  ({per_dot_ns:7.1f} ns/dot)",
          flush=True)
    return tf


# ------------------------------------------------- lane-shift / pool costs
def shift_kernel(salt_ref, x_ref, out_ref, scr, *, nops, mode):
    salt = salt_ref[0]

    def body(i, _):
        x = x_ref[:] + ((i % 4).astype(jnp.float32) + salt)
        if mode == "shift1":          # unaligned lane slice (dw=1 patch)
            scr[:, :512] = x[:, 1:513]
        elif mode == "roll":          # full lane roll
            scr[:] = jnp.roll(x, -1, axis=1)
        elif mode == "pool3":         # stride-3 lane compaction + max
            m = jnp.maximum(jnp.maximum(x[:, 0:507:3], x[:, 1:508:3]),
                            x[:, 2:509:3])
            scr[:, :169] = m
        elif mode == "copyblk":       # aligned sublane-block copy (192,128)
            scr[:192, :128] = x[:192, :128] + 1.0
        return 0

    jax.lax.fori_loop(0, nops, body, 0)
    out_ref[:] = scr[:8, :128]


def bench_shift(mode, m=64, lanes=640, grid=8, nops=2048):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((m, lanes)), jnp.float32)
    call = pl.pallas_call(
        functools.partial(shift_kernel, nops=nops, mode=mode),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((m, lanes), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m, lanes), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((8 * grid, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )

    @jax.jit
    def run(x):
        def step(_, i):
            salt = jnp.reshape(i.astype(jnp.float32) * 1e-30, (1,))
            return None, call(salt, x).sum()
        _, sums = jax.lax.scan(step, None, jnp.arange(ITERS))
        return sums.sum()

    dt = timed(run, x)
    per = dt / (grid * nops * ITERS) * 1e9
    print(f"{mode:7s} ({m}x{lanes}): {dt*1e3:8.2f} ms total -> "
          f"{per:8.1f} ns/op", flush=True)
    return per


if __name__ == "__main__":
    print(f"device: {jax.devices()}", flush=True)
    print("--- Mosaic bf16 dot rates (candidate conv2 formulations) ---")
    bench_dot(64, 640, 512, ndots=512)    # W-in-lanes, pre-assembled K=640
    bench_dot(128, 640, 512, ndots=256)   # M sensitivity
    bench_dot(256, 640, 512, ndots=128)
    bench_dot(512, 512, 512, ndots=128)   # square reference
    bench_dot(512, 640, 128, ndots=256)   # im2col, N padded to 128
    bench_dot(64, 640, 128, ndots=2048)   # batch-in-lanes, 1 w-position
    bench_dot(64, 640, 256, ndots=1024)   # batch-in-lanes, 256-clip tile
    bench_dot(128, 768, 128, ndots=1024)  # 2-position band-stacked, 75%
    bench_dot(64, 640, 512, ndots=512, mode="accum")  # RMW comparison
    print("--- stationary-A / rotating-B (real conv2 operand pattern) ---")
    bench_dot(64, 640, 512, ndots=512, mode="brot")
    bench_dot(512, 512, 512, ndots=128, mode="brot")
    print("--- VPU lane ops (assembly / pool building blocks) ---")
    bench_shift("shift1")
    bench_shift("roll")
    # bench_shift("pool3") -- does not lower: Mosaic's gather rule rejects
    # the stride-3 lane compaction ("Shape mismatch in input, indices and
    # output"); the W-in-lanes pool tail would need a 0/1 selection-matrix
    # dot (another ~2.8 ms at the measured rates) instead.
    bench_shift("copyblk", m=256, lanes=128)
