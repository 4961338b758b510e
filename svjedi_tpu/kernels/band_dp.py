"""Pallas TPU kernel: batched banded affine-gap local alignment.

Same contract as align.extend.band_dp_batch (the XLA scan reference), laid
out for the VPU: problems ride the sublane axis (8 per tile), the band rides
the lane axis (multiple of 128), and all row-to-row state lives in VMEM
scratch. The horizontal-gap prefix scan uses log2(band) shifted maxes (see
align/extend.py docstring); per-lane best tracking defers the expensive
cross-lane argmax to a single reduction at the end of each problem tile.

Equivalence with the reference implementation is asserted in
tests/test_pallas_kernel.py (interpret mode on CPU, compiled on TPU).
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


def _kernel(q_ref, t_ref, out_ref, H, V, SQH, STH, SQV, STV,
            BEST, BQS, BTS, BQE, BTE, *, band, m_rows, params):
    B = band
    oe = params.open_extend
    ext = params.gap_extend
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (P_TILE, B), 1)

    # Row "-1": everything empty.
    H[:] = jnp.zeros((P_TILE, B), jnp.int32)
    V[:] = jnp.full((P_TILE, B), NEG, jnp.int32)
    SQH[:] = jnp.zeros((P_TILE, B), jnp.int32)
    STH[:] = k_idx
    SQV[:] = jnp.zeros((P_TILE, B), jnp.int32)
    STV[:] = k_idx
    BEST[:] = jnp.zeros((P_TILE, B), jnp.int32)
    BQS[:] = jnp.zeros((P_TILE, B), jnp.int32)
    BTS[:] = jnp.zeros((P_TILE, B), jnp.int32)
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
        sqh, sth, sqv, stv = SQH[:], STH[:], SQV[:], STV[:]

        h_up = _shift_left(h_prev, k_idx, B, NEG)
        v_up = _shift_left(v_prev, k_idx, B, NEG)
        sqh_up = _shift_left(sqh, k_idx, B, 0)
        sth_up = _shift_left(sth, k_idx, B, 0)
        sqv_up = _shift_left(sqv, k_idx, B, 0)
        stv_up = _shift_left(stv, k_idx, B, 0)

        v_open = h_up + oe
        v_ext = v_up + ext
        v_new = jnp.maximum(v_open, v_ext)
        take_open = v_open >= v_ext
        sqv_new = jnp.where(take_open, sqh_up, sqv_up)
        stv_new = jnp.where(take_open, sth_up, stv_up)

        diag = h_prev + sub
        htmp = jnp.maximum(diag, v_new)
        take_diag = diag >= v_new
        sq_t = jnp.where(take_diag, sqh, sqv_new)
        st_t = jnp.where(take_diag, sth, stv_new)
        reset = htmp <= 0
        htmp = jnp.maximum(htmp, 0)
        sq_t = jnp.where(reset, i + 1, sq_t)
        st_t = jnp.where(reset, i + 1 + k_idx, st_t)

        F = _shift_right_s(htmp, k_idx, 1, NEG) + oe
        fq = _shift_right_s(sq_t, k_idx, 1, 0)
        ft = _shift_right_s(st_t, k_idx, 1, 0)
        s = 1
        while s < B:
            cand = _shift_right_s(F, k_idx, s, NEG) + ext * s
            cq = _shift_right_s(fq, k_idx, s, 0)
            ct = _shift_right_s(ft, k_idx, s, 0)
            take = cand > F
            F = jnp.where(take, cand, F)
            fq = jnp.where(take, cq, fq)
            ft = jnp.where(take, ct, ft)
            s <<= 1

        take_f = F > htmp
        h_new = jnp.where(take_f, F, htmp)
        sqh_new = jnp.where(take_f, fq, sq_t)
        sth_new = jnp.where(take_f, ft, st_t)

        improved = h_new > BEST[:]
        BEST[:] = jnp.where(improved, h_new, BEST[:])
        BQS[:] = jnp.where(improved, sqh_new, BQS[:])
        BTS[:] = jnp.where(improved, sth_new, BTS[:])
        BQE[:] = jnp.where(improved, i, BQE[:])
        BTE[:] = jnp.where(improved, i + k_idx, BTE[:])

        H[:] = h_new
        V[:] = v_new
        SQH[:] = sqh_new
        STH[:] = sth_new
        SQV[:] = sqv_new
        STV[:] = stv_new
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

    out_ref[:, 0:1] = best
    out_ref[:, 1:2] = select(BQS[:])
    out_ref[:, 2:3] = select(BTS[:])
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
    grid = (P // P_TILE,)
    scratch = [
        pltpu.VMEM((P_TILE, band), jnp.int32) for _ in range(11)
    ]
    kernel = functools.partial(
        _kernel, band=band, m_rows=M, params=params
    )
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
            flops=40 * P * M * band, bytes_accessed=P * (2 * M + band), transcendentals=0
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
