"""Pallas TPU kernel: banded DP with fused window fetch (async DMA).

The XLA-gather formulation of window extraction (align/device.py) is
byte-granular and dominates runtime on TPU. This kernel keeps the flat read
and panel sequences in HBM and, per 8-problem tile, DMAs each problem's
contiguous read window and target window straight into VMEM scratch using
scalar-prefetched offsets — the flash-attention pattern applied to sequence
alignment. Host→device traffic per batch is five int32 vectors.

Mosaic constrains slices of 1-D int8 HBM memrefs to the (1024) tiling: both
the slice shape and (dynamic) offset must be 1024-aligned. Window starts are
arbitrary byte offsets, so each DMA fetches the enclosing aligned span
(offset rounded down, length rounded up) into a coarse VMEM buffer, and the
row is realigned with one dynamic lane rotate — the same
aligned-chunk-plus-rotate trick the DP row loop already uses for its
128-lane loads (kernels/band_dp.py).

Contract notes:
- ``reads_hbm`` must be the forward reads concatenated with the whole-array
  reverse complement and padded with >= bucket + 2*ALIGN sentinel bases (the
  host addresses reverse-strand windows inside the rc half with positive
  stride);
- ``panel_hbm`` must be padded with >= bucket + band + 2*ALIGN sentinel
  bases on both ends so every aligned DMA is in range; validity is enforced
  in-kernel from the ``t_lo``/``t_hi`` absolute bounds;
- per-problem read-window length ``m`` masks the tail of the fixed-size
  window to N.

Scores/spans are identical to band_dp_pallas / band_dp_batch on the same
windows (asserted in tests).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..align.extend import DPParams, NEG

P_TILE = 8
#: 1-D int8 memref tile size — DMA slice offsets/shapes must be multiples.
ALIGN = 1024


def _round_up(x: int, a: int) -> int:
    return ((x + a - 1) // a) * a


def _shift_left(a, k_idx, band, fill):
    rolled = pltpu.roll(a, band - 1, axis=1)
    return jnp.where(k_idx == band - 1, fill, rolled)


def _shift_right_s(a, k_idx, s, fill):
    rolled = pltpu.roll(a, s, axis=1)
    return jnp.where(k_idx < s, fill, rolled)


def _kernel(
    # scalar prefetch (SMEM):
    q_start_ref, t_start_ref, m_ref, t_lo_ref, t_hi_ref,
    # tensor inputs (HBM):
    reads_ref, panel_ref,
    # output:
    out_ref,
    # scratch (16 per-row coarse buffers, then the assembled tiles):
    *rest,
    band, bucket, qw, tw, params,
):
    qc = rest[:P_TILE]
    tc = rest[P_TILE : 2 * P_TILE]
    (qbuf, tbuf, H, V, SH, SV, BEST, BS, BQE, BTE, sems) = rest[2 * P_TILE :]
    B = band
    oe = params.open_extend
    ext = params.gap_extend
    tile = pl.program_id(0)
    base_p = tile * P_TILE

    # ---- fused window fetch: 16 aligned contiguous DMAs per tile ----
    # Per-row 1-D scratch targets: Mosaic forbids single-row slices of an
    # (8, W) int8 VMEM buffer (sublane tiling is 8), so each DMA lands in
    # its own full buffer.
    def q_base(row):
        q0 = q_start_ref[base_p + row]
        return pl.multiple_of((q0 // ALIGN) * ALIGN, ALIGN)

    def t_base(row):
        t0 = t_start_ref[base_p + row]
        return pl.multiple_of((t0 // ALIGN) * ALIGN, ALIGN)

    for row in range(P_TILE):
        pltpu.make_async_copy(
            reads_ref.at[pl.ds(q_base(row), qw)], qc[row], sems.at[row]
        ).start()
        pltpu.make_async_copy(
            panel_ref.at[pl.ds(t_base(row), tw)],
            tc[row],
            sems.at[P_TILE + row],
        ).start()
    for row in range(P_TILE):
        pltpu.make_async_copy(
            reads_ref.at[pl.ds(q_base(row), qw)], qc[row], sems.at[row]
        ).wait()
        pltpu.make_async_copy(
            panel_ref.at[pl.ds(t_base(row), tw)],
            tc[row],
            sems.at[P_TILE + row],
        ).wait()

    # ---- realign each row by its sub-tile residue (dynamic rotate) ----
    qrows, trows = [], []
    for row in range(P_TILE):
        qres = q_start_ref[base_p + row] % ALIGN
        qrow = qc[row][:].reshape(1, qw).astype(jnp.int32)
        qal = pltpu.roll(qrow, (qw - qres) % qw, axis=1)
        qrows.append(qal[:, :bucket])
        tres = t_start_ref[base_p + row] % ALIGN
        trow = tc[row][:].reshape(1, tw).astype(jnp.int32)
        tal = pltpu.roll(trow, (tw - tres) % tw, axis=1)
        trows.append(tal[:, : bucket + B])
    qbuf[:] = jnp.concatenate(qrows, axis=0).astype(jnp.int8)
    tbuf[:] = jnp.concatenate(trows, axis=0).astype(jnp.int8)

    # Per-problem scalars as (8, 1) columns.
    def col(ref):
        return jnp.stack(
            [ref[base_p + r] for r in range(P_TILE)]
        ).reshape(P_TILE, 1)

    m_col = col(m_ref)
    t_lo_col = col(t_lo_ref)
    t_hi_col = col(t_hi_ref)
    t_start_col = col(t_start_ref)

    k_idx = jax.lax.broadcasted_iota(jnp.int32, (P_TILE, B), 1)
    H[:] = jnp.zeros((P_TILE, B), jnp.int32)
    V[:] = jnp.full((P_TILE, B), NEG, jnp.int32)
    SH[:] = k_idx
    SV[:] = k_idx
    BEST[:] = jnp.zeros((P_TILE, B), jnp.int32)
    BS[:] = jnp.zeros((P_TILE, B), jnp.int32)
    BQE[:] = jnp.full((P_TILE, B), -1, jnp.int32)
    BTE[:] = jnp.full((P_TILE, B), -1, jnp.int32)

    def row_fn(i, _):
        r = i % 128
        base = pl.multiple_of(i - r, 128)
        t_chunk = tbuf[:, pl.ds(base, B + 128)].astype(jnp.int32)
        trow = pltpu.roll(t_chunk, (B + 128 - r) % (B + 128), axis=1)[:, :B]
        # Mask out-of-path target lanes (absolute position bounds).
        t_pos = t_start_col + i + k_idx
        trow = jnp.where((t_pos >= t_lo_col) & (t_pos < t_hi_col), trow, 4)
        q_chunk = qbuf[:, pl.ds(base, 128)].astype(jnp.int32)
        qi = pltpu.roll(q_chunk, (128 - r) % 128, axis=1)[:, :1]
        qi = jnp.where(i < m_col, qi, 4)
        sub = jnp.where((qi == trow) & (qi < 4), params.match, params.mismatch)

        h_prev, v_prev = H[:], V[:]
        sh, sv = SH[:], SV[:]
        h_up = _shift_left(h_prev, k_idx, B, NEG)
        v_up = _shift_left(v_prev, k_idx, B, NEG)
        sh_up = _shift_left(sh, k_idx, B, 0)
        sv_up = _shift_left(sv, k_idx, B, 0)
        v_open = h_up + oe
        v_ext = v_up + ext
        v_new = jnp.maximum(v_open, v_ext)
        sv_new = jnp.where(v_open >= v_ext, sh_up, sv_up)
        diag = h_prev + sub
        htmp = jnp.maximum(diag, v_new)
        s_t = jnp.where(diag >= v_new, sh, sv_new)
        reset = htmp <= 0
        htmp = jnp.maximum(htmp, 0)
        s_t = jnp.where(reset, ((i + 1) << 16) + (i + 1) + k_idx, s_t)

        F = _shift_right_s(htmp, k_idx, 1, NEG) + oe
        fs = _shift_right_s(s_t, k_idx, 1, 0)
        s = 1
        while s < B:
            cand = _shift_right_s(F, k_idx, s, NEG) + ext * s
            cs = _shift_right_s(fs, k_idx, s, 0)
            take = cand > F
            F = jnp.where(take, cand, F)
            fs = jnp.where(take, cs, fs)
            s <<= 1

        take_f = F > htmp
        h_new = jnp.where(take_f, F, htmp)
        sh_new = jnp.where(take_f, fs, s_t)

        improved = h_new > BEST[:]
        BEST[:] = jnp.where(improved, h_new, BEST[:])
        BS[:] = jnp.where(improved, sh_new, BS[:])
        BQE[:] = jnp.where(improved, i, BQE[:])
        BTE[:] = jnp.where(improved, i + k_idx, BTE[:])
        H[:] = h_new
        V[:] = v_new
        SH[:] = sh_new
        SV[:] = sv_new
        return 0

    jax.lax.fori_loop(0, bucket, row_fn, 0)

    best_lane = BEST[:]
    best = jnp.max(best_lane, axis=1, keepdims=True)
    big = jnp.int32(1 << 30)
    lane = jnp.min(
        jnp.where(best_lane == best, k_idx, big), axis=1, keepdims=True
    )
    pick = k_idx == lane

    def select(arr):
        return jnp.sum(jnp.where(pick, arr, 0), axis=1, keepdims=True)

    packed = select(BS[:])
    out_ref[:, 0:1] = best
    out_ref[:, 1:2] = packed >> 16
    out_ref[:, 2:3] = packed & 0xFFFF
    out_ref[:, 3:4] = select(BQE[:])
    out_ref[:, 4:5] = select(BTE[:])
    out_ref[:, 5:8] = jnp.zeros((P_TILE, 3), jnp.int32)


def band_dp_dma_raw(
    reads_hbm: jnp.ndarray,  # int8 (2N + pad,): fwd ++ revcomp ++ sentinel pad
    panel_hbm: jnp.ndarray,  # int8, sentinel-padded both ends
    q_start: jnp.ndarray,  # (P,) int32 window start in reads_hbm
    t_start: jnp.ndarray,  # (P,) int32 window lane-0 in panel_hbm
    m: jnp.ndarray,  # (P,) int32 read-window length
    t_lo: jnp.ndarray,  # (P,) int32 first valid panel_hbm index of the path
    t_hi: jnp.ndarray,  # (P,) int32 one-past-last valid index
    bucket: int,
    band: int,
    params: DPParams = DPParams(),
    interpret: bool = False,
) -> jnp.ndarray:
    """Raw kernel output: (P, 8) int32 with columns
    [score, qs, ts, qe, te, 0, 0, 0] — callers batching many dispatches keep
    this on device and transfer once (the TPU tunnel costs ~40 ms per
    host-device round trip, so per-batch transfers dominate otherwise)."""
    P = q_start.shape[0]
    assert P % P_TILE == 0 and band % 128 == 0 and bucket % 128 == 0
    assert bucket < (1 << 15) and bucket + band < (1 << 16)
    # Coarse (tile-aligned) DMA spans: worst-case residue is ALIGN - 1.
    qw = _round_up(bucket + ALIGN - 1, ALIGN)
    tw = _round_up(bucket + band + ALIGN - 1, ALIGN)
    assert reads_hbm.shape[0] % ALIGN == 0, "reads buffer must be tile-padded"
    assert panel_hbm.shape[0] % ALIGN == 0, "panel buffer must be tile-padded"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(P // P_TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (P_TILE, 8), lambda i, *_: (i, 0)
        ),
        scratch_shapes=[pltpu.VMEM((qw,), jnp.int8) for _ in range(P_TILE)]
        + [pltpu.VMEM((tw,), jnp.int8) for _ in range(P_TILE)]
        + [
            pltpu.VMEM((P_TILE, bucket), jnp.int8),
            pltpu.VMEM((P_TILE, bucket + band), jnp.int8),
        ]
        + [pltpu.VMEM((P_TILE, band), jnp.int32) for _ in range(8)]
        + [pltpu.SemaphoreType.DMA((2 * P_TILE,))],
    )
    kernel = functools.partial(
        _kernel, band=band, bucket=bucket, qw=qw, tw=tw, params=params
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, 8), jnp.int32),
        interpret=interpret,
    )(
        q_start.astype(jnp.int32),
        t_start.astype(jnp.int32),
        m.astype(jnp.int32),
        t_lo.astype(jnp.int32),
        t_hi.astype(jnp.int32),
        reads_hbm,
        panel_hbm,
    )


@functools.partial(
    jax.jit, static_argnames=("bucket", "band", "params", "interpret")
)
def band_dp_dma(
    reads_hbm: jnp.ndarray,
    panel_hbm: jnp.ndarray,
    q_start: jnp.ndarray,
    t_start: jnp.ndarray,
    m: jnp.ndarray,
    t_lo: jnp.ndarray,
    t_hi: jnp.ndarray,
    bucket: int,
    band: int,
    params: DPParams = DPParams(),
    interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    out = band_dp_dma_raw(
        reads_hbm, panel_hbm, q_start, t_start, m, t_lo, t_hi,
        bucket=bucket, band=band, params=params, interpret=interpret,
    )
    return {
        "score": out[:, 0],
        "qs": out[:, 1],
        "ts": out[:, 2],
        "qe": out[:, 3],
        "te": out[:, 4],
    }
