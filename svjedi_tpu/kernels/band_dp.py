"""Pallas TPU kernel: batched banded affine-gap local alignment.

Same contract as align.extend.band_dp_batch (the XLA scan reference), laid
out for the VPU: problems ride the sublane axis (8 per tile), the band rides
the lane axis (multiple of 128), and all row-to-row state lives in VMEM
scratch. The horizontal-gap prefix scan uses log2(band) shifted maxes (see
align/extend.py docstring).

Optimizations over the straightforward port:
- alignment-start coordinates (qs, ts) are packed into one int32 per cell
  (qs << 16 | ts), halving the start-propagation shifts and selects; valid
  for read windows < 32768 and target windows < 65536 (enforced);
- per-lane best tracking defers the cross-lane argmax to one reduction at
  the end of each problem tile;
- target/read rows are loaded from 128-aligned chunks and rotated by the
  residue (Mosaic requires aligned lane offsets; dynamic rotate is 32-bit).

Equivalence with the reference implementation is asserted in
tests/test_pallas_kernel.py (interpret mode on CPU; compiled on TPU in
bench runs).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..align.extend import DPParams, NEG

P_TILE = 8  # problems per sublane tile


def _shift_left(a, k_idx, band, fill):
    """a[..., k] <- a[..., k+1], filling the last lane.

    pltpu.roll only accepts non-negative shifts (out[k] = in[(k - s) % B]),
    so a left shift by one is a circular roll by band - 1.
    """
    rolled = pltpu.roll(a, band - 1, axis=1)
    return jnp.where(k_idx == band - 1, fill, rolled)


def _shift_right_s(a, k_idx, s, fill):
    rolled = pltpu.roll(a, s, axis=1)
    return jnp.where(k_idx < s, fill, rolled)


def _kernel(q_ref, t_ref, out_ref, H, V, SH, SV, BEST, BS, BQE, BTE,
            *, band, m_rows, params):
    B = band
    oe = params.open_extend
    ext = params.gap_extend
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (P_TILE, B), 1)

    # Row "-1": everything empty. Start of the diagonal successor of init
    # cell k is (qs=0, ts=k).
    H[:] = jnp.zeros((P_TILE, B), jnp.int32)
    V[:] = jnp.full((P_TILE, B), NEG, jnp.int32)
    SH[:] = k_idx  # packed (0 << 16) | k
    SV[:] = k_idx
    BEST[:] = jnp.zeros((P_TILE, B), jnp.int32)
    BS[:] = jnp.zeros((P_TILE, B), jnp.int32)
    BQE[:] = jnp.full((P_TILE, B), -1, jnp.int32)
    BTE[:] = jnp.full((P_TILE, B), -1, jnp.int32)

    def row(i, _):
        # Mosaic requires lane-dimension offsets to be 128-aligned: load an
        # aligned chunk one tile wider, then rotate by the residue.
        r = i % 128
        base = pl.multiple_of(i - r, 128)
        t_chunk = t_ref[:, pl.ds(base, B + 128)].astype(jnp.int32)
        trow = pltpu.roll(t_chunk, (B + 128 - r) % (B + 128), axis=1)[:, :B]
        q_chunk = q_ref[:, pl.ds(base, 128)].astype(jnp.int32)
        qi = pltpu.roll(q_chunk, (128 - r) % 128, axis=1)[:, :1]
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
        # New alignment starts at the diagonal successor (i+1, k).
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

    jax.lax.fori_loop(0, m_rows, row, 0)

    # Cross-lane reduction: first lane achieving the max score.
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


@functools.partial(
    jax.jit, static_argnames=("band", "params", "interpret")
)
def band_dp_pallas(
    q: jnp.ndarray,  # (P, M) int8, P multiple of 8
    t: jnp.ndarray,  # (P, M + band) int8
    band: int,
    params: DPParams = DPParams(),
    interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Pallas-accelerated band DP; same contract as band_dp_batch."""
    P, M = q.shape
    assert P % P_TILE == 0, "batch must be a multiple of 8"
    assert band % 128 == 0, "band must be a multiple of 128"
    assert M % 128 == 0, "read-window length must be a multiple of 128"
    assert M < (1 << 15) and M + band < (1 << 16), "packed starts need M<32768"
    grid = (P // P_TILE,)
    scratch = [pltpu.VMEM((P_TILE, band), jnp.int32) for _ in range(8)]
    kernel = functools.partial(_kernel, band=band, m_rows=M, params=params)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((P_TILE, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (P_TILE, M + band), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (P_TILE, 8), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((P, 8), jnp.int32),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=40 * P * M * band,
            bytes_accessed=P * (2 * M + band),
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, t)
    return {
        "score": out[:, 0],
        "qs": out[:, 1],
        "ts": out[:, 2],
        "qe": out[:, 3],
        "te": out[:, 4],
    }
