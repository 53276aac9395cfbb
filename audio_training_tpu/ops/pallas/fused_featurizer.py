"""Fully-fused waveform -> mel -> PCEN Pallas TPU kernel.

Replaces the XLA matmul-FFT path (ops/fftmel.py) + associative-scan PCEN
(ops/pcen.py) for the production inference geometry (n_fft=4096, hop=281).
The XLA path is HBM-bound: it materializes the framed signal and both DFT
stages in HBM (~15 GB per 256-clip batch, measured 55 ms).  This kernel
reads each raw clip once (~190 MB/batch), runs framing -> window ->
two-stage matmul-DFT -> power -> mel -> PCEN entirely in VMEM, and writes
only the (n_mels, frames) PCEN image (~105 MB/batch).

Reference behavior being replaced: ``tfdataset.py:2008-2059`` (tf.signal
stft+mel) and ``tfpcen.py:33-99`` (EMA smoother + PCEN).

Mosaic layout rules this design obeys (probed on the target toolchain —
notably, a *dynamic* lane-slice base combined with a non-128-aligned static
offset crashes the backend compiler, so framing always slices at fully
static offsets):

* clips are blocked EIGHT per grid step — a (8, L) block keeps the raw
  operand in its native T(8,128) layout, where the round-2 (1, 1, L)
  single-clip block forced a T(1,128) relayout copy of the whole padded
  batch (~1.2 ms/iter measured: ``reshape`` 0.72 + ``pad`` 0.50).  A
  ``fori_loop`` walks the 8 rows; the only dynamic slicing is the
  lane-ALIGNED full-row copy into a row scratch (offset 0, 128-multiple
  width — the safe class), after which every framing slice is static,
  exactly as before.  The loop body is traced once, so compile time stays
  at the single-clip kernel's level (the alternative — statically
  unrolling 8 clips — was measured at 28 min of Mosaic compile and a
  >100 MB scoped-vmem stack, docs/PERFORMANCE.md);
* the whole clip runs as ONE frame tile when the frame scratch fits VMEM
  (<= 768 frames), so each DFT stage is a single big MXU dot per clip —
  measurably faster than 128-frame tiles, whose 4*n_tiles small dots pay
  dispatch overhead per dot.  The tile is rounded to the 8-sublane
  granularity (513 production frames -> 520), not to 128: the stage-1
  output's frame dim sits on SUBLANES, so 520 pays 19% fewer stage-1
  sublane tiles than the round-2 640, and the raw operand needs 34 k
  fewer padding samples per clip.  Longer inputs fall back to 128-frame
  tiles (every slice offset is static either way, so no hop-alignment
  constraint exists);
* framing assembles each frame as a (32, 128) tile from a (L/128, 128)
  row-major view of the clip (the reshape is a free minor-dim split done
  OUTSIDE the kernel): frame t starting at sample 128q + o is two
  full-sublane stores — rows [q, q+32) lanes [o, 128) and rows [q+1, q+33)
  lanes [0, o) — instead of one (1, 4096) single-sublane store.  A
  decomposition probe measured the (1, 4096) framing at 7.6 ms of the
  11.8 ms mel kernel (the store unit ran at 1/8 sublane utilization —
  the round-3 doc's "~0.8 ms framing" estimate was wrong and the dots
  were never the wall); the tile framing is bitwise identical and ~2 ms
  faster end-to-end (docs/PERFORMANCE.md round 3b);
* no lane-dimension merges anywhere;
* all matmuls keep the lane operand dimension at 128 and run on the MXU
  (re/im stacked into the M dimension of stage 1);
* PCEN's causal EMA over a 128-frame tile is ONE lower-triangular Toeplitz
  matmul (``L[j, t] = (1-w)^(t-j)``, built in-kernel from the runtime
  ``smooth`` scalar) plus a decay-weighted carry flowing tile to tile as a
  loop value — no sequential scan anywhere.

DFT decomposition (n_fft = 4096 = 32 * 128): with n = 128*n1 + n2 and
k = k1 + 32*k2 (k1 in [0,32), k2 in [0,32) covering bins 0..1023 — the
11 kHz filterbank's support ends at bin ~940):

    stage 1:  A[k1, n2] = sum_n1 xw[128*n1 + n2] * W32^(n1*k1)
    stage 2:  X[k1, k2] = sum_n2 A[k1, n2] * W4096^(n2*k1) * W128^(n2*k2)

with the twiddle folded into the stage-2 operators at trace time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_training_tpu.ops.stft import (
    hann_window,
    num_frames_centered,
    num_frames_tf,
)

R1 = 32  # stage-1 DFT size (k1 bins)
R2 = 128  # stage-2 DFT size (n2 / lane dimension)
K2C = 32  # stage-2 columns kept: bins k1 + 32*k2 cover 0..1023
HB = R1 // 2  # conjugate-folded stage-2 batch count (see _dft_constants)
TILE = 128  # frames per multi-tile chunk (long inputs only)
N_FFT = R1 * R2

_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}


# Precision LADDER (round 5).  On TPU, "highest" f32 dots lower to SIX
# bf16 MXU passes (BF16_BF16_F32_X6) and "default" to one; the middle
# rung reconstructs ~16 mantissa bits from THREE passes over the bf16
# hi/lo error decomposition x = hi + lo (hi = bf16(x)):
#
#   x @ w ~= hi(x)@hi(w) + hi(x)@lo(w) + lo(x)@hi(w)      [drops lo@lo]
#
# * "bf16_3x" (the shipped middle tier): the DFT/mel OPERATORS are split
#   ONCE at kernel top (hi exactly bf16-representable, so the dots'
#   internal rounding of it is exact); the DATA side is split in-kernel,
#   once per dot site.  Measured on-chip: 8.7e-6 global mel parity.
# * "bf16_3x_manual": the naive probe formulation — both sides split at
#   runtime inside _dot, i.e. the constant operators are re-split at
#   every dot site in every row iteration.  Same math; measured 26.2 vs
#   28.9 ms ("highest") at B=512 — kept only as the A/B probe tier.
#
# Paths that DON'T work on this backend, probed round 5 (methods
# /tmp/probe_ladder.py, /tmp/probe_presplit*.py; results
# docs/PERFORMANCE.md round 5):
# * ``jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3`` as the dot precision:
#   Mosaic's pallas lowering rejects it ("'DotAlgorithmPreset' object is
#   not subscriptable") — algorithm presets don't thread through
#   pallas_call lowering.
# * Splitting the operators at TRACE time and feeding hi/lo as extra VMEM
#   operands: numerically WRONG on this backend — a REF-READ f32 operand
#   fed directly to a DEFAULT-precision dot loses small-magnitude mantissa
#   relative to the identical values COMPUTED in-kernel (1.45e-3 vs
#   8.7e-6 global mel error, bit-identical operand values; isolated by
#   the reconstruct-vs-resplit probe — recomputing lo in-kernel from the
#   same refs restores 8.7e-6, an astype round-trip of the ref-read does
#   NOT).  Suspected shared-exponent quantization in the MXU's direct
#   VMEM-load conversion path; per-element VPU converts only happen for
#   computed operands.  Hence the kernel-top split below reads the f32
#   originals and splits them with in-kernel ops.
# * Mosaic rejects ``Precision.HIGH`` dots outright (round 2).
# * The round-2 SINGLE-doubled-dot formulation ``[lh;ll] @ [rh|rl]``
#   measured SLOWER than plain "highest" — 44.3 vs 30.7 ms per 256-clip
#   batch — the runtime concats of the frame data cost more than the
#   saved passes.  The three-separate-dots form avoids the concats.


def _split_hi_lo(v):
    hi = v.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, v - hi


def _dot_x3_manual(lhs, rhs, dn):
    def d(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=dn,
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    lh, ll = _split_hi_lo(lhs)
    rh, rl = _split_hi_lo(rhs)
    return d(lh, rh) + d(lh, rl) + d(ll, rh)


def _dot(lhs, rhs, dn, precision):
    if precision == "bf16_3x_manual":
        return _dot_x3_manual(lhs, rhs, dn)
    return jax.lax.dot_general(
        lhs, rhs, dimension_numbers=dn,
        precision=_PRECISIONS[precision],
        preferred_element_type=jnp.float32,
    )


def _dot_x3_presplit(w_hi, w_lo, x, dn, swap=False):
    """Three-pass X3 dot with a PRE-SPLIT constant operator: w_hi must be
    exactly bf16-representable (so the dot's internal rounding of it is
    exact) and w_lo = w - w_hi.  Only the data side is split here.
    ``swap=True`` puts the data on the LHS (w on the RHS)."""

    def d(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=dn,
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    xh, xl = _split_hi_lo(x)
    if swap:
        return d(xh, w_hi) + d(xh, w_lo) + d(xl, w_hi)
    return d(w_hi, xh) + d(w_lo, xh) + d(w_hi, xl)


def _dft_constants(hop: int) -> dict[str, np.ndarray]:
    """Trace-time operator tables for the two-stage DFT, CONJUGATE-FOLDED
    (round 4).

    The frame is real, so the stage-1 DFT-32 planes obey
    ``a[32-k1] = conj(a[k1])`` — only 32 real planes are independent
    (17 re + 15 im; ``a_im[0] = a_im[16] = 0``).  Stage 1 therefore emits
    exactly 32 plane rows (M 64 -> 32, half the stage-1 MACs and half the
    live intermediate):

      planes[0..16]  = a_re[k1 = 0..16]
      planes[17..31] = a_im[k1 = 1..15]

    Stage 2 rebatches the 32 x (M=64) dots as HB=16 batches of M=128
    (same MACs, full-M tiles): batch b contracts P1[b] = planes[b] and
    P2[b] = planes[16+b] and outputs re/im of BOTH ``X[b + 32 k2]`` and
    ``X[(32-b) + 32 k2]`` (batch 0 pairs the self-conjugate k1=0 with
    k1=16, whose im-planes are zero).  The mel packing (pack_mel_flat)
    permutes filterbank columns into the resulting (b, half, k2) flat
    order, so the mel output is the same bins — measured 12.8 -> 10.8
    ms/iter at B=512 on the full PCEN kernel, parity vs the unfolded
    operators 3e-7 (probe method /tmp/probe_conj.py; docs/PERFORMANCE.md
    round 4).

    (A merged single-dot stage 2 contracting ``(part, n2)`` with K=256 was
    tried and REJECTED by Mosaic: ``tpu.matmul lhs contracting dims must be
    of size 1`` — multi-dim contractions don't lower.  Stage 2 stays as two
    K=128 batched dots.)
    """
    n1 = np.arange(R1)
    # a[k1, n2] = sum_n1 x[128 n1 + n2] e^{-2pi i n1 k1 / 32}
    cosm = np.cos(2 * np.pi * np.outer(n1, n1) / R1)  # [n1, k1] symmetric
    sinm = -np.sin(2 * np.pi * np.outer(n1, n1) / R1)
    d1ri = np.zeros((R1, R1), np.float64)  # plane rows x n1
    for k1 in range(HB + 1):
        d1ri[k1] = cosm[:, k1]
    for j, k1 in enumerate(range(1, HB)):
        d1ri[HB + 1 + j] = sinm[:, k1]
    d1ri = d1ri.astype(np.float32)

    n2 = np.arange(R2)
    k2 = np.arange(K2C)
    tw = np.exp(-2j * np.pi * np.arange(R1)[:, None] * n2[None, :] / N_FFT)
    d2 = np.exp(-2j * np.pi * n2[:, None] * k2[None, :] / R2)  # [n2, k2]
    # folded stage-2 coefficient C[k1, n2, k2] = tw[k1, n2] * d2[n2, k2],
    # pre-transposed to (k1, k2, n2) so frames land on the lane dimension
    ct = (tw[:, :, None] * d2[None, :, :]).transpose(0, 2, 1)
    e_re = np.zeros((HB, 4 * K2C, R2), np.float64)  # coeff of P1 = planes[b]
    e_im = np.zeros((HB, 4 * K2C, R2), np.float64)  # coeff of P2 = planes[16+b]
    zero = np.zeros((K2C, R2))
    # Output-row block order is [re X(b); re X(pair); im X(b); im X(pair)]
    # (re components in the top half, im in the bottom) so the kernel's
    # power pass is ONE aligned add of the two contiguous halves of the
    # squared output — no sublane concatenate — landing directly in
    # pack_mel_flat's (b, half, k2) order.
    for b in range(HB):
        if b == 0:
            # P1[0] = a_re[0] -> X[32 k2]; P2[0] = a_re[16] -> X[16 + 32 k2]
            e_re[0] = np.concatenate([ct[0].real, zero, ct[0].imag, zero])
            e_im[0] = np.concatenate([zero, ct[HB].real, zero, ct[HB].imag])
        else:
            kc = R1 - b  # the conjugate partner: a_re[kc] = a_re[b],
            # a_im[kc] = -a_im[b]
            e_re[b] = np.concatenate(
                [ct[b].real, ct[kc].real, ct[b].imag, ct[kc].imag])
            e_im[b] = np.concatenate(
                [-ct[b].imag, ct[kc].imag, ct[b].real, -ct[kc].real])
    e_re = e_re.astype(np.float32)
    e_im = e_im.astype(np.float32)
    win = hann_window(N_FFT)[None, :]  # (1, n_fft)
    # Rolled-window table for framing v3 (see _featurizer_kernel): for each
    # lane offset o, the Hann window circularly rolled o samples, in the
    # (R1, R2) frame-tile shape.  (R2, R1, R2) f32 = 2 MB of VMEM constants.
    winr = np.stack([
        np.roll(win[0], o).reshape(R1, R2) for o in range(R2)
    ]).astype(np.float32)
    return {"d1ri": d1ri, "e_re": e_re, "e_im": e_im, "win": win,
            "winr": winr}


def pack_mel_flat(mel_weights: np.ndarray) -> np.ndarray:
    """(M, 1+n_fft//2) filterbank -> (M, R1*K2C) in the conjugate-folded
    kernel's power order: bin k = k1 + R1*k2 lives at flat index
    ``b*2*K2C + half*K2C + k2`` where batch b and half recover k1 as
    ``k1 = b`` (half 0) or ``k1 = 32-b, with b=0 -> 16`` (half 1) — see
    _dft_constants."""
    m, n_bins = mel_weights.shape
    out = np.zeros((m, R1 * K2C), np.float32)
    for b in range(HB):
        for half in range(2):
            k1 = b if half == 0 else (HB if b == 0 else R1 - b)
            for k2 in range(K2C):
                k = k1 + R1 * k2
                if k < n_bins:
                    out[:, b * 2 * K2C + half * K2C + k2] = mel_weights[:, k]
    return out


ROWS = 8  # clips per grid step: keeps the raw operand in T(8,128)


def _featurizer_kernel(
    params_ref,  # SMEM (8,): gain bias root smooth eps a_power ...
    raw_ref,  # (ROWS, L//128, 128) eight clips, row-major sample view
    d1ri_ref,  # (R1, R1) conjugate-folded stage-1 planes operator
    e_re_ref,  # (HB, 4*K2C, R2) coeff of planes[b]
    e_im_ref,  # (HB, 4*K2C, R2) coeff of planes[16+b]
    win_ref,  # (R1, R2) hann window in frame-tile shape
    winr_ref,  # (R2, R1, R2) rolled windows (framing v3)
    melw_ref,  # (M_pad, R1*K2C)
    *rest,  # [stats_ref (M_pad, 2)] out_ref, frames_scr, row_scr
    hop: int,
    tile: int,
    n_tiles: int,
    precision: str,
    do_pcen: bool,
    norm_wave_len: int = 0,
    frontend: bool = False,
    in_rows: int = 0,
    scr_rows: int = 0,
    out_dtype: jnp.dtype = jnp.float32,
    rolled: bool = True,
):
    """norm_wave_len > 0 folds the per-clip waveform min-max normalize
    (ops.features.normalize_rows, tfdataset.py:1916-1934) into the framing
    affine; ``frontend`` applies badwinner2's MagTransform + per-mel-row BN
    (badwinner2.py:230-233) to the mel output — the whole pre-CNN chain
    then runs in this one kernel.

    ``rolled`` selects framing v3 (round 4): each frame is assembled
    CIRCULARLY ROLLED so that its first sample lands at lane 0 of an
    aligned row — one full (R1, R2) load+mul+store per frame plus a tiny
    (1, o) boundary fixup, instead of two lane-offset partial stores.  The
    DFT of a circularly shifted sequence differs only by a per-bin PHASE
    (shift theorem), and this kernel consumes |X|^2 only, so the power/mel
    output is EXACTLY the true frame's (same math, different f32 rounding
    order).  Measured at B=512: framing 11.38 -> 3.59 ms, full mel kernel
    14.19 -> 12.46 ms (docs/PERFORMANCE.md round 4).  The
    ``norm_wave_len`` fold keeps the v2 framing (its window scale/bias
    masking is written in true-frame order)."""
    if frontend:
        stats_ref, out_ref, frames_scr, row_scr = rest
    else:
        out_ref, frames_scr, row_scr = rest
    m_pad = out_ref.shape[1]
    win0 = win_ref[:]

    if do_pcen:
        gain = jnp.minimum(params_ref[0], 1.0)
        bias = params_ref[1]
        one_over_root = 1.0 / jnp.maximum(params_ref[2], 1.0)
        w = jnp.clip(params_ref[3], 0.0, 1.0)
        eps = params_ref[4]
        logd = jnp.log(jnp.maximum(1.0 - w, 1e-30))
        # PCEN runs in CHUNKS of <= 128 frames within each tile (round 4):
        # the Toeplitz EMA matmul is O(chunk^2) per mel row, so a single
        # 520-frame tile paid a (520, 520) dot — 4x the MACs of 5 x 104
        # chunks chained by the same decay-weighted carry the multi-tile
        # path has always used (identical math, reassociated).  Measured
        # at B=512: mel+PCEN 17.27 -> 15.13 ms (docs/PERFORMANCE.md r4).
        n_chunks = -(-tile // TILE)
        if tile % n_chunks == 0:
            pcen_chunks = [tile // n_chunks] * n_chunks
        else:
            pcen_chunks = [TILE] * (tile // TILE)
            if tile % TILE:
                pcen_chunks.append(tile % TILE)

        def pcen_tables(ct):
            jj = jax.lax.broadcasted_iota(jnp.int32, (ct, ct), 0)
            tt = jax.lax.broadcasted_iota(jnp.int32, (ct, ct), 1)
            dt = (tt - jj).astype(jnp.float32)
            ema_op = jnp.where(tt >= jj, jnp.exp(dt * logd), 0.0)
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (m_pad, ct), 1
            ).astype(jnp.float32)
            decay_pow = jnp.exp((lane + 1.0) * logd)  # d^(t+1)
            onehot0 = jnp.where(lane == 0.0, 1.0, 0.0)
            onehot_last = jnp.where(lane == float(ct - 1), 1.0, 0.0)
            return ema_op, decay_pow, onehot0, onehot_last

        tables = {ct: pcen_tables(ct) for ct in sorted(set(pcen_chunks))}
        log_bias_root = jnp.exp(one_over_root * jnp.log(bias))

    d1ri_op, e_re_op = d1ri_ref[:], e_re_ref[:]
    e_im_op, melw_op = e_im_ref[:], melw_ref[:]
    if precision == "bf16_3x":
        # split the operators ONCE at kernel top (vs per dot site in the
        # "manual" tier).  MUST be in-kernel computed values, not ref-fed
        # pre-split operands — see the ladder notes above _split_hi_lo.
        d1ri_op, d1ri_lo = _split_hi_lo(d1ri_op)
        e_re_op, e_re_lo = _split_hi_lo(e_re_op)
        e_im_op, e_im_lo = _split_hi_lo(e_im_op)
        melw_op, melw_lo = _split_hi_lo(melw_op)

        def site_dot(w, w_lo, x, dn):
            return _dot_x3_presplit(w, w_lo, x, dn)
    else:
        d1ri_lo = e_re_lo = e_im_lo = melw_lo = None

        def site_dot(w, w_lo, x, dn):
            return _dot(w, x, dn, precision)

    idx2 = None
    if norm_wave_len:
        idx2 = (
            R2 * jax.lax.broadcasted_iota(jnp.int32, (R1, R2), 0)
            + jax.lax.broadcasted_iota(jnp.int32, (R1, R2), 1)
        )

    if scr_rows > in_rows:
        # zero-fill the scratch rows past the clip ONCE per grid step: the
        # last frames read them as tf pad_end zero padding (the row copy
        # below never touches them)
        row_scr[in_rows:, :] = jnp.zeros(
            (scr_rows - in_rows, R2), jnp.float32
        )

    def row_body(r, _):
        # Aligned dynamic-sublane copy (lane offset 0, full rows): the ONLY
        # dynamic slice in the kernel.  Framing below then slices the
        # scratch at fully static offsets, as the backend requires.
        row_scr[:in_rows, :] = raw_ref[pl.ds(r, 1), :, :][0]
        win = win0
        win_bias = None
        if norm_wave_len:
            # y = 2*((x - mn)/(mx - mn) + 1e-6 - 0.5): fold into the window
            # multiply as y*win = x*(scale*win) + (bias*win).  The zero pad
            # beyond the clip must stay zero in NORMALIZED space (tf pad_end
            # pads the normalized signal), handled by static masking below.
            nw_q, nw_o = divmod(norm_wave_len, R2)
            mn = jnp.min(row_scr[:nw_q, :])
            mx = jnp.max(row_scr[:nw_q, :])
            if nw_o:
                tail = row_scr[nw_q : nw_q + 1, :nw_o]
                mn = jnp.minimum(mn, jnp.min(tail))
                mx = jnp.maximum(mx, jnp.max(tail))
            rng_v = mx - mn
            scale = 2.0 / rng_v
            bias_w = 2e-6 - 1.0 - 2.0 * mn / rng_v
            win_bias = win0 * bias_w
            win = win0 * scale

        carry = None
        for g in range(n_tiles):
            base = g * tile * hop
            # ---- framing + window: all offsets static ------------------
            # Each frame t starting at sample 128q + o is assembled as a
            # (32, 128) tile from the row-major clip view: rows [q, q+32)
            # lanes [o, 128) then rows [q+1, q+33) lanes [0, o) — two
            # full-sublane stores instead of one (1, 4096) single-sublane
            # store (which measured 7.6 ms/batch, 64% of the mel kernel).
            # NOTE: scratch/operands stay f32 even at "default" precision —
            # explicit bf16 scratch + bf16 operators were measured 28.6 ms
            # vs 13.5 ms (Mosaic's implicit per-dot converts beat explicit
            # bf16 operands, whose 16-sublane packing degrades the
            # contracted-sublane-dim dots).  See docs/PERFORMANCE.md.
            for i in range(tile):
                start = base + hop * i
                q, o = divmod(start, R2)
                if rolled and o != 0:
                    # framing v3: circularly-rolled frame.  Rows [q, q+R1)
                    # hold samples [128q, 128q+4096) — the rolled sequence
                    # x_true[(n - o) mod 4096] EXCEPT positions [0, o),
                    # whose true tail samples live in row q+R1's first o
                    # lanes.  One full aligned-lane store + a (1, o) fixup;
                    # |DFT|^2 is circular-shift invariant, so power/mel is
                    # exactly the true frame's.
                    wr = winr_ref[o]
                    frames_scr[i] = row_scr[q : q + R1, :] * wr
                    frames_scr[i, 0:1, :o] = (
                        row_scr[q + R1 : q + R1 + 1, :o] * wr[0:1, :o]
                    )
                elif o == 0:
                    frames_scr[i] = row_scr[q : q + R1, :] * win
                else:
                    frames_scr[i, :, : R2 - o] = (
                        row_scr[q : q + R1, o:] * win[:, : R2 - o]
                    )
                    frames_scr[i, :, R2 - o :] = (
                        row_scr[q + 1 : q + R1 + 1, :o] * win[:, R2 - o :]
                    )
            if win_bias is not None:
                # bias addition for the normalize fold: the frames fully
                # inside the clip are a static contiguous prefix — ONE bulk
                # add; the few (static) boundary frames crossing
                # norm_wave_len get an iota-masked bias; frames past the
                # clip get none (they are zero-padding of the NORMALIZED
                # signal).
                t_full = min(
                    max((norm_wave_len - N_FFT - base) // hop + 1, 0), tile
                )
                if t_full > 0:
                    frames_scr[:t_full] = (
                        frames_scr[:t_full] + win_bias[None, :, :]
                    )
                for i in range(t_full, tile):
                    v = min(max(norm_wave_len - (base + hop * i), 0), N_FFT)
                    if v > 0:
                        frames_scr[i] = frames_scr[i] + jnp.where(
                            idx2 < v, win_bias, 0.0
                        )

            # ---- stage 1: contract n1 -> 32 independent real planes -----
            # (conjugate fold, see _dft_constants: rows 0..16 a_re[0..16],
            # rows 17..31 a_im[1..15])
            x2 = frames_scr[:]  # (F, n1, n2) — the scratch's native shape
            a = site_dot(
                d1ri_op, d1ri_lo, x2, (((1,), (1,)), ((), ()))
            )  # (R1, F, n2)

            # ---- stage 2 (twiddle folded): HB=16 batches of M=128 -------
            # batch b outputs re/im of X[b + 32 k2] AND X[(32-b) + 32 k2]
            dn = (((2,), (2,)), ((0,), (0,)))
            x_ri = site_dot(
                e_re_op, e_re_lo, a[:HB], dn
            ) + site_dot(
                e_im_op, e_im_lo, a[HB:], dn
            )  # (b, 4*K2C, F): [re X(b); re X(pair); im X(b); im X(pair)]

            # ---- power + mel ---------------------------------------------
            # re parts fill the top half of the stage-2 output rows and im
            # parts the bottom (operator row order, _dft_constants), so
            # |X|^2 is one aligned half-add — no sublane concatenate —
            # already in pack_mel_flat's (b, half, k2) order.
            sq = x_ri * x_ri
            power = sq[:, : 2 * K2C, :] + sq[:, 2 * K2C :, :]
            mel = site_dot(
                melw_op, melw_lo, power.reshape(R1 * K2C, tile),
                (((1,), (0,)), ((), ())),
            )  # (M_pad, F)

            if not do_pcen:
                if frontend:
                    # badwinner2 frontend: x**sigmoid(a) (MagTransform,
                    # badwinner2.py:32-49) then the per-mel-row BN affine
                    # y = x*s + b with s = 1/sqrt(var+eps), b = -mean*s
                    # (BatchNorm(axis=1, no scale/center), badwinner2.py:
                    # 233).  mel >= 0; the 1e-30 clamp maps power 0 to
                    # ~exp(-69g)~=0 (denormals flush to zero here).
                    a_pw = jnp.clip(params_ref[5], -2.0, 1.0)
                    gpow = 1.0 / (1.0 + jnp.exp(-a_pw))
                    mel = jnp.exp(gpow * jnp.log(jnp.maximum(mel, 1e-30)))
                    mel = mel * stats_ref[:, 0:1] + stats_ref[:, 1:2]
                out_ref[pl.ds(r, 1), :, g * tile : (g + 1) * tile] = (
                    mel[None].astype(out_dtype)
                )
                continue

            # ---- PCEN: EMA as chunked lower-triangular Toeplitz matmuls -
            c0 = 0
            for ct in pcen_chunks:
                ema_op, decay_pow, onehot0, onehot_last = tables[ct]
                melc = mel[:, c0 : c0 + ct]
                m_scan = jax.lax.dot_general(
                    melc * w, ema_op,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )  # (M_pad, ct): sum_{j<=t} d^(t-j) * w * mel[:, c0+j]

                # carry: m_t += d^(t+1) * s_prev; at the clip start the
                # reference seeds the EMA with frame 0 (tfpcen.py:33-39),
                # so s_prev = mel[:, 0].
                if carry is None:
                    s_prev = jnp.sum(melc * onehot0, axis=1, keepdims=True)
                else:
                    s_prev = carry
                m_full = m_scan + decay_pow * s_prev
                carry = jnp.sum(m_full * onehot_last, axis=1, keepdims=True)

                # PCEN pointwise (tfpcen.py:89-99); min-max runs outside.
                smooth_pow = jnp.exp(gain * jnp.log(eps + m_full))
                col = g * tile + c0
                out_ref[pl.ds(r, 1), :, col : col + ct] = (
                    jnp.exp(one_over_root * jnp.log(
                        melc / smooth_pow + bias))
                    - log_bias_root
                )[None].astype(out_dtype)
                c0 += ct
        return 0

    jax.lax.fori_loop(0, ROWS, row_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("hop", "tile", "n_tiles", "precision", "do_pcen",
                     "interpret", "norm_wave_len", "out_dtype"),
)
def _fused_call(
    raw_padded: jax.Array,  # (B, L) f32, L a 128-multiple — or the
    # pre-reshaped row-major clip view (B, L//128, 128): serving loops
    # should feed the 3D view so the minor-dim split is done once on the
    # host side; inside a scan XLA does NOT hoist the loop-invariant
    # reshape and pays a ~0.9 ms/iter materializing copy at B=512
    # (copy.11 in the device profile, docs/PERFORMANCE.md)
    params: jax.Array,  # (8,) f32
    melw_pad: jax.Array,  # (M_pad, R1*K2C)
    hop: int,
    tile: int,
    n_tiles: int,
    precision: str,
    do_pcen: bool,
    interpret: bool,
    norm_wave_len: int = 0,
    fe_stats: jax.Array | None = None,  # (M_pad, 2) badwinner2 BN affine
    out_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    if raw_padded.ndim == 2:
        b, length = raw_padded.shape
    else:
        b, rows_in, lanes = raw_padded.shape
        if lanes != 128:
            raise ValueError("row view must be (B, L//128, 128)")
        length = rows_in * 128
    # Pad the batch to the 8-clip row block (keeps the operand T(8,128));
    # dead rows are computed and sliced off — the featurizer is ~40 us/clip,
    # so a short final block costs less than the relayout the (1, 1, L)
    # single-clip block forced (docs/PERFORMANCE.md round 3).
    b_pad = -(-b // ROWS) * ROWS
    if b_pad != b:
        raw_padded = jnp.pad(
            raw_padded, ((0, b_pad - b),) + ((0, 0),) * (raw_padded.ndim - 1)
        )
    if raw_padded.ndim == 2:
        # free minor-dim split: the kernel frames from this row-major view
        raw_padded = raw_padded.reshape(b_pad, length // 128, 128)
    # The sample pad the last frames read past the clip is zero-filled
    # IN-KERNEL (row scratch tail), not materialized: an XLA pad of the raw
    # operand measured 0.9 ms/iter at B=512 plus a layout-copy it induced
    # in the bench loop (docs/PERFORMANCE.md round 3b).
    need = (n_tiles * tile - 1) * hop + N_FFT + 128
    scr_rows = -(-need // 128)
    in_rows = length // 128
    if in_rows > scr_rows:
        raw_padded = raw_padded[:, :scr_rows]
        in_rows = scr_rows
    m_pad = melw_pad.shape[0]
    consts = _dft_constants(hop)
    frontend = fe_stats is not None
    # framing v3 (rolled frames) whenever the window is the plain Hann; the
    # normalize_waveform fold scales/biases the window in TRUE-frame order,
    # so it keeps framing v2 (see _featurizer_kernel docstring)
    rolled = norm_wave_len == 0
    kernel = functools.partial(
        _featurizer_kernel, hop=hop, tile=tile, n_tiles=n_tiles,
        precision=precision, do_pcen=do_pcen,
        norm_wave_len=norm_wave_len, frontend=frontend,
        in_rows=in_rows, scr_rows=scr_rows, out_dtype=out_dtype,
        rolled=rolled,
    )

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda bb: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    frames_total = n_tiles * tile
    mac = tile * (R1 * R1 * R2 + 2 * HB * 4 * K2C * R2
                  + R1 * K2C * m_pad + tile * m_pad)
    d1ri = jnp.asarray(consts["d1ri"])
    e_re = jnp.asarray(consts["e_re"])
    e_im = jnp.asarray(consts["e_im"])
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((ROWS, in_rows, 128), lambda bb: (bb, 0, 0),
                     memory_space=pltpu.VMEM),
        const_spec((R1, R1)),
        const_spec((HB, 4 * K2C, R2)),
        const_spec((HB, 4 * K2C, R2)),
        const_spec((R1, R2)),
        const_spec((R2, R1, R2)),
        const_spec((m_pad, R1 * K2C)),
    ]
    operands = [params, raw_padded, d1ri, e_re, e_im,
                jnp.asarray(consts["win"].reshape(R1, R2)),
                jnp.asarray(consts["winr"]), melw_pad]
    if frontend:
        in_specs.append(const_spec((m_pad, 2)))
        operands.append(fe_stats)
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // ROWS,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ROWS, m_pad, frames_total),
                               lambda bb: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile, R1, R2), jnp.float32),
            pltpu.VMEM((scr_rows, 128), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct(
            (b_pad, m_pad, frames_total), out_dtype
        ),
        compiler_params=pltpu.CompilerParams(
            # Clips are independent (the PCEN carry only flows across tiles
            # WITHIN one row) — "parallel" lets megacore generations split
            # the row-block grid across TensorCores.  The default 16 MB
            # scoped-vmem budget is too small for the unrolled body
            # (25.8 MB measured at 5 tiles).
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * mac * b_pad * n_tiles),
            bytes_accessed=int(
                b_pad * length * 4
                + b_pad * m_pad * frames_total * np.dtype(out_dtype).itemsize
            ),
            transcendentals=int(b_pad * n_tiles * m_pad * tile * 4),
        ),
        interpret=interpret,
    )(*operands)
    return out[:b]


class FusedFeaturizer:
    """Waveform -> PCEN'd (or raw) mel, one kernel per batch.

    Parity contracts: mel matches ``ops.fftmel.mel_power_matmul`` (tf-stft
    framing, ``tfdataset.py:2008-2059``); PCEN matches ``ops.pcen.pcen``
    (``tfpcen.py:33-110``) including the frame-0 EMA seed and the global
    min-max normalization (applied outside the kernel on valid frames).
    """

    def __init__(
        self,
        mel_weights: np.ndarray,
        n_fft: int = 4096,
        hop: int = 281,
        precision: str = "highest",
        gain: float = 0.98,
        bias: float = 2.0,
        root: float = 2.0,
        smooth: float = 0.04,
        eps: float = 1e-6,
        center: bool = False,
    ):
        if n_fft != N_FFT:
            raise ValueError("fused featurizer requires n_fft=4096")
        support = np.flatnonzero(np.asarray(mel_weights).max(axis=0) > 0)
        if support.size and support[-1] >= R1 * K2C:
            raise ValueError("filterbank support exceeds bin 1023")
        self.hop = hop
        self.precision = precision
        # centered (librosa inference) convention: constant pad by
        # n_fft//2 both sides, frames = 1 + n//hop — matches
        # ops.fftmel.MatmulMelPlan(center=True) / ops.stft.stft_centered
        self.center = center
        self.n_mels = mel_weights.shape[0]
        self.m_pad = max(-(-self.n_mels // 8) * 8, 8)
        melw = pack_mel_flat(mel_weights)
        pad = np.zeros((self.m_pad, R1 * K2C), np.float32)
        pad[: self.n_mels] = melw
        self.melw_pad = jnp.asarray(pad)
        self.params = jnp.asarray(
            [gain, bias, root, smooth, eps, 0.0, 0.0, 0.0], jnp.float32
        )

    # One tile per clip when the frame scratch fits comfortably in VMEM
    # (tile*4096*4 bytes; 768 frames = 12 MB): the whole clip runs as 4 big
    # MXU dots instead of 4*n_tiles small ones — dot dispatch overhead was
    # a measurable slice of the 128-frame-tile kernel.  The single tile is
    # rounded to 8 frames (the sublane granularity of the stage-1 output's
    # frame dim), not 128: the production 513-frame clip runs as 520
    # frames instead of the round-2 640 — 19% fewer stage-1 sublane tiles
    # and ~34k fewer padding samples read per clip.  Longer inputs fall
    # back to 128-frame tiles.  No hop-alignment constraint exists in
    # either mode: every slice offset is fully static (the Python-unrolled
    # framing loop), and tile bases g*128*hop are trivially lane-aligned.
    MAX_SINGLE_TILE = 768

    def _tiling(self, frames: int) -> tuple[int, int]:
        frames_pad = max(-(-frames // 8) * 8, 8)
        if frames_pad <= self.MAX_SINGLE_TILE:
            return frames_pad, 1
        return TILE, -(-frames // TILE)

    def _padded(self, raw: jax.Array, tile: int, n_tiles: int) -> jax.Array:
        # Alignment-only pad (to a 128-sample row boundary): the sample pad
        # the last frames read past the clip is zero-filled in-kernel (row
        # scratch tail), so the production 144 000-sample clip — already a
        # 128-multiple — pays NO pad op at all.
        pad = -raw.shape[-1] % 128
        if pad > 0:
            raw = jnp.pad(raw, ((0, 0), (0, pad)))
        return raw

    def __call__(
        self,
        raw: jax.Array,
        pcen: bool = True,
        normalize: bool = True,
        interpret: bool | None = None,
        normalize_waveform: bool = False,
        frontend_params: tuple | None = None,
        step_salt: jax.Array | None = None,
        out_dtype: jnp.dtype = jnp.float32,
    ) -> jax.Array:
        """(B, samples) -> (B, n_mels, frames) mel power or PCEN image.

        ``raw`` may also be the pre-reshaped row-major clip view
        ``(B, samples//128, 128)`` (samples a 128-multiple, non-centered
        convention only) — identical output; serving loops should feed
        this view so the minor-dim split happens once outside any scan
        (XLA does not hoist the loop-invariant reshape: ~0.9 ms/iter of
        copy at B=512, docs/PERFORMANCE.md).

        ``normalize_waveform`` folds the per-clip min-max normalize
        (ops.features.normalize_rows) into the kernel's framing affine.
        ``frontend_params = (a_power, bn_mean, bn_var)`` additionally
        applies badwinner2's MagTransform + per-mel-row BN to the mel
        output (badwinner2.py:230-233) so the entire pre-CNN chain runs in
        ONE kernel (mutually exclusive with ``pcen``).

        ``out_dtype`` selects the output element type; ``jnp.bfloat16``
        halves the image write (and the consuming CNN's read) and removes
        the XLA-side f32->bf16 convert pass when the consumer is a bf16
        CNN.  The kernel computes in f32 throughout and converts only at
        the output store, so ``fz(x, out_dtype=bf16)`` is bitwise
        ``fz(x).astype(bf16)`` for ``normalize=False`` paths (the PCEN
        global min-max then runs in bf16 on the bf16 output).

        ``step_salt`` (benchmark harnesses only) lands in the unused
        params[7] SMEM slot: a per-step value makes the otherwise
        loop-invariant kernel call opaque to XLA's loop-invariant code
        motion / CSE and to result-caching relays, WITHOUT mutating the
        audio batch — chaining iterations by bumping one element of a
        scan-carried raw batch made XLA pick a batch-minor layout for the
        carry and pay ~2 ms/iter relaying 288 MB back to row-major at
        B=512 (copy.7/copy.11/copy.13 in the device profile), a cost real
        serving never sees because fresh batches arrive row-major."""
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        if raw.ndim == 3:
            if self.center:
                raise ValueError(
                    "the (B, L//128, 128) row view implements the tf-stft "
                    "convention; pass (B, samples) for center=True"
                )
            if raw.shape[-1] != 128:
                raise ValueError("row view must be (B, samples//128, 128)")
            samples = raw.shape[1] * 128
        else:
            samples = raw.shape[-1]
        if frontend_params is not None and pcen:
            raise ValueError(
                "frontend_params is the badwinner2 frontend; PCEN fronts "
                "the pretrained-backbone models only"
            )
        if self.center and (normalize_waveform or frontend_params):
            raise ValueError(
                "normalize_waveform/frontend_params implement the training "
                "pipeline's tf-stft convention, not the centered one"
            )
        norm_wave_len = samples if normalize_waveform else 0
        params_base = self.params
        if step_salt is not None:
            params_base = params_base.at[7].set(
                jnp.asarray(step_salt, jnp.float32).reshape(())
            )
        if self.center:
            frames = num_frames_centered(samples, self.hop)
            half = N_FFT // 2
            raw = jnp.pad(raw, ((0, 0), (half, half)))
        else:
            frames = num_frames_tf(samples, self.hop)
        tile, n_tiles = self._tiling(frames)
        params = params_base
        fe_stats = None
        if frontend_params is not None:
            a_power, bn_mean, bn_var = frontend_params
            params = params.at[5].set(jnp.asarray(a_power).reshape(()))
            s = 1.0 / jnp.sqrt(jnp.asarray(bn_var) + 1e-3)  # Keras BN eps
            b = -jnp.asarray(bn_mean) * s
            fe_stats = jnp.zeros((self.m_pad, 2), jnp.float32)
            fe_stats = fe_stats.at[: self.n_mels, 0].set(s)
            fe_stats = fe_stats.at[: self.n_mels, 1].set(b)
        out = _fused_call(
            self._padded(raw, tile, n_tiles), params, self.melw_pad,
            self.hop, tile, n_tiles, self.precision, pcen, interpret,
            norm_wave_len=norm_wave_len, fe_stats=fe_stats,
            out_dtype=np.dtype(out_dtype),
        )[:, : self.n_mels, :frames]
        if pcen and normalize:
            max_v = jnp.max(out)
            min_v = jnp.min(out)
            out = 2.0 * ((out - min_v) / (max_v - min_v)) - 1.0
        return out
