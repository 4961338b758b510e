"""Pallas TPU kernel v3: flat-band score-only DP, 128 problems per step.

Why v3: on this hardware cross-lane shifts cost ~70-100 cycles standalone
but amortize to ~vreg-copy speed on wide arrays, ALU ops are nearly free,
and — the decisive measurement — kernel cost scales sharply with the number
of live loop-carried state arrays (VMEM spill pressure): a 9-array kernel
with full start-coordinate tracking runs ~20x slower than the same loop
carrying 4 arrays. v2 (band_dp_dma) carries 9 arrays for 8 problems/step at
~0.8 Gcell/s; v3 carries 5 for 128 problems/step and reaches >10 Gcell/s.

The price: the forward pass reports only (score, qe, te) — the alignment
END. Start coordinates (qs, ts) come from a SECOND, equally cheap pass over
the winning candidates only: flip the window matrices upside down (a dense
XLA ``jnp.flip`` — every window becomes suffix-aligned, leading sentinel
rows are harmless to local alignment), clamp the window to [0, qe] x
[0, te] via the ordinary masks, and rerun the same kernel; its end maps
back as qs = bucket-1-qe'', ts = (bucket+band-1)-1-te''. This is the
classic bidirectional Smith-Waterman trick expressed as two identical
TPU dispatches. align/pipeline.py orchestrates the two passes; ties
between equal-scoring alignments may pick a different optimal start than
the one-pass v2 kernel (both are valid optima).

Layout: one grid step scores 128 problems. A DP state array is (8, X)
int32 with X = 16*band lanes; flat cell c = sublane*X + lane holds band
offset k = c // 128 of problem h = c % 128. Band shifts are lane rolls by
128*s with a sublane carry (static); shifts by multiples of 16 bands are
pure (cheap) sublane rolls, which covers the deep gap-scan levels. Per-row
values arrive from TRANSPOSED window matrices (``qT[i, p]``, prepared by a
packed-word XLA gather, align/device.py) via sublane roll + broadcast +
lane tiling — no lane<->sublane reshapes, which Mosaic cannot lower. The
target band is a shifting state (shift + lane-(B-1) insert per row).

Scores equal band_dp_batch / band_dp_dma exactly; composed spans are
optimal-alignment spans (tests/test_band_dp_v3.py).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..align.extend import DPParams, NEG

#: Problems per grid step (the lane modulus of the flat layout).
P_STEP = 128


def _kernel(n_valid_ref, qT_ref, tT_ref, score_ref, qe_ref, te_ref,
            *scratch, band, bucket, params, interpret, hbm=False):
    B = band
    X = 16 * B  # lanes per state array; 8 sublanes * X = B * 128 cells
    oe = params.open_extend
    ext = params.gap_extend

    sub_i = jax.lax.broadcasted_iota(jnp.int32, (8, X), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, X), 1)
    k_idx = sub_i * 16 + lane_i // 128  # band offset of each flat cell

    # Batches are padded to a tiny class set; grid steps holding only
    # padding (every problem has m=0) skip all work — their output rows are
    # garbage the host never reads. Prefetch layout: [n_valid] ++ per-step
    # row bounds (max window length m of the step's 128 problems, rows
    # beyond it are sentinel for the whole group when the host sorts
    # problems by m; bucket when unknown).
    step_active = pl.program_id(0) * P_STEP < n_valid_ref[0]
    row_bound = n_valid_ref[1 + pl.program_id(0)]

    if hbm:
        # Large-window mode: qT/tT stay in HBM (their per-step VMEM blocks
        # would exceed scoped VMEM); (8, 128) tiles are DMAed on demand.
        # (Double-buffered prefetch was tried and measured SLOWER than the
        # serial start/start/wait/wait pattern on this hardware.)
        qbuf, tbuf, sems = scratch  # (32, 128) int8 each
        col0 = pl.program_id(0) * 128

        def load_qt32(qrow, trow):
            """Fetch 32 q rows + 32 t rows in two DMAs (amortizes the
            ~serial DMA latency over 4 processing groups)."""
            qcp = pltpu.make_async_copy(
                qT_ref.at[pl.ds(qrow, 32), pl.ds(col0, 128)], qbuf,
                sems.at[0],
            )
            tcp = pltpu.make_async_copy(
                tT_ref.at[pl.ds(trow, 32), pl.ds(col0, 128)], tbuf,
                sems.at[1],
            )
            qcp.start()
            tcp.start()
            qcp.wait()
            tcp.wait()
            return qbuf[:].astype(jnp.int32), tbuf[:].astype(jnp.int32)

        def load_t32(row):
            cp = pltpu.make_async_copy(
                tT_ref.at[pl.ds(row, 32), pl.ds(col0, 128)], tbuf,
                sems.at[1],
            )
            cp.start()
            cp.wait()
            return tbuf[:].astype(jnp.int32)

        load_q = None
        load_t = None
        load_qt = load_qt32
    else:
        def load_q(row8):
            return qT_ref[pl.ds(row8, 8), :].astype(jnp.int32)

        def load_t(row8):
            return tT_ref[pl.ds(row8, 8), :].astype(jnp.int32)

        load_qt = None

    def spread(row32):
        """(*, >=128) per-problem values -> (8, X) on every cell."""
        if interpret:
            return jnp.tile(row32[:1, :128], (8, X // 128))
        return pltpu.repeat(
            jnp.broadcast_to(row32[:1, :128], (8, 128)), X // 128, 1
        )

    def extract(tile32, r):
        """Row r of an (8, 128) tile, spread to (8, X)."""
        rolled = tile32 if r == 0 else pltpu.roll(tile32, 8 - r, axis=0)
        return spread(rolled)

    def band_shift_down(a, s, fill):
        """out[k] = a[k - s] (toward higher k), fill at k < s."""
        S = 128 * s
        sl, ss = S % X, S // X
        b = pltpu.roll(a, sl, axis=1) if sl else a
        c = pltpu.roll(b, ss % 8, axis=0) if ss % 8 else b
        if sl:
            c2 = pltpu.roll(b, (ss + 1) % 8, axis=0)
            c = jnp.where(lane_i >= sl, c, c2)
        return jnp.where(k_idx < s, fill, c)

    def band_shift_up1(a, fill):
        """out[k] = a[k + 1], fill at k == B - 1."""
        b = pltpu.roll(a, X - 128, axis=1)
        c = jnp.where(lane_i < X - 128, b, pltpu.roll(b, 7, axis=0))
        return jnp.where(k_idx == B - 1, fill, c)

    @pl.when(step_active)
    def _body():
        _kernel_body(
            qT_ref, tT_ref, score_ref, qe_ref, te_ref, scratch,
            band=band, bucket=bucket, params=params, interpret=interpret,
            hbm=hbm, row_bound=row_bound,
            helpers=(spread, extract, band_shift_down,
                     band_shift_up1, load_q, load_qt, load_t,
                     load_t32 if hbm else None, k_idx, lane_i),
        )


def _kernel_body(qT_ref, tT_ref, score_ref, qe_ref, te_ref, scratch, *,
                 band, bucket, params, interpret, hbm, row_bound, helpers):
    (spread, extract, band_shift_down, band_shift_up1, load_q, load_qt,
     load_t, load_t32, k_idx, lane_i) = helpers
    B = band
    X = 16 * B
    oe = params.open_extend
    ext = params.gap_extend

    # ---- prefill the shifting target band: t_cur[k] = t[k] ----
    if hbm:
        def prefill(j32, t_cur):
            tt = load_t32(j32 * 32)
            for g in range(4):
                ttile = tt[g * 8 : (g + 1) * 8]
                for r in range(8):
                    tv = extract(ttile, r)
                    t_cur = jnp.where(
                        k_idx == B - 1, tv, band_shift_up1(t_cur, 4)
                    )
            return t_cur

        t_cur = jax.lax.fori_loop(
            0, B // 32, prefill, jnp.full((8, X), 4, jnp.int32)
        )
    else:
        def prefill(j8, t_cur):
            ttile = load_t(j8 * 8)
            for r in range(8):
                tv = extract(ttile, r)
                t_cur = jnp.where(k_idx == B - 1, tv, band_shift_up1(t_cur, 4))
            return t_cur

        t_cur = jax.lax.fori_loop(
            0, B // 8, prefill, jnp.full((8, X), 4, jnp.int32)
        )

    init = (
        t_cur,
        jnp.zeros((8, X), jnp.int32),  # H
        jnp.full((8, X), NEG, jnp.int32),  # V
        jnp.zeros((8, X), jnp.int32),  # BEST
        jnp.full((8, X), -1, jnp.int32),  # BQE (row of each cell's best)
    )

    def process_group(i8, qtile, ttile, carry):
        (t_cur, H, V, BEST, BQE) = carry
        for r in range(8):
            i = i8 * 8 + r
            qi = extract(qtile, r)
            sub = jnp.where(
                (qi == t_cur) & (qi < 4), params.match, params.mismatch
            )

            h_up = band_shift_up1(H, NEG)
            v_up = band_shift_up1(V, NEG)
            v_new = jnp.maximum(h_up + oe, v_up + ext)
            htmp = jnp.maximum(jnp.maximum(H + sub, v_new), 0)

            F = band_shift_down(htmp, 1, NEG) + oe
            s = 1
            while s < B:
                F = jnp.maximum(F, band_shift_down(F, s, NEG) + ext * s)
                s <<= 1
            h_new = jnp.maximum(htmp, F)

            improved = h_new > BEST
            BEST = jnp.where(improved, h_new, BEST)
            BQE = jnp.where(improved, i, BQE)
            H, V = h_new, v_new

            tv = extract(ttile, r)
            t_cur = jnp.where(k_idx == B - 1, tv, band_shift_up1(t_cur, 4))
        return (t_cur, H, V, BEST, BQE)

    if hbm:
        def super_fn(i32, carry):
            qt, tt = load_qt(i32 * 32, i32 * 32 + B)
            for g in range(4):
                carry = process_group(
                    i32 * 4 + g, qt[g * 8 : (g + 1) * 8],
                    tt[g * 8 : (g + 1) * 8], carry,
                )
            return carry

        (_, _, _, BEST, BQE) = jax.lax.fori_loop(
            0, jnp.minimum((row_bound + 31) // 32, bucket // 32),
            super_fn, init,
        )
    else:
        def group_fn(i8, carry):
            return process_group(i8, load_q(i8 * 8), load_t(i8 * 8 + B), carry)

        (_, _, _, BEST, BQE) = jax.lax.fori_loop(
            0, jnp.minimum((row_bound + 7) // 8, bucket // 8),
            group_fn, init,
        )

    # ---- per-problem reduction over the band (sublanes + lane chunks) ----
    def fold(m, op):
        s = X // 2
        while s >= 128:
            m = op(m, pltpu.roll(m, X - s, axis=1))
            s //= 2
        return m  # lanes [0, 128) hold the reduction per problem

    best = fold(jnp.max(BEST, axis=0, keepdims=True), jnp.maximum)
    best_b = spread(best)
    big = jnp.int32(1 << 30)
    lane_min = fold(
        jnp.min(
            jnp.where(BEST == best_b, k_idx, big), axis=0, keepdims=True
        ),
        jnp.minimum,
    )
    pick = (k_idx == spread(lane_min)) & (BEST == best_b)
    qe = fold(
        jnp.sum(jnp.where(pick, BQE, 0), axis=0, keepdims=True), jnp.add
    )

    def emit(ref, row):
        ref[:, :] = jnp.broadcast_to(row[:1, :128], (8, 128))

    emit(score_ref, best)
    emit(qe_ref, qe)
    # te = qe + k of the winning cell (k is constant along a cell's
    # diagonal history, so the end's band offset IS the picked lane).
    emit(te_ref, qe + jnp.where(lane_min == big, 0, lane_min))


def band_dp_v3_fwd(
    qT: jnp.ndarray,  # (bucket, P) int8, sentinel 4 beyond each window
    tT: jnp.ndarray,  # (bucket + band, P) int8, sentinel 4 outside path
    bucket: int,
    band: int,
    params: DPParams = DPParams(),
    n_valid=None,  # scalar: real problem count (grid steps past it skip)
    interpret: bool = False,
):
    """Forward pass: per problem (score, qe, te) — ends only.

    Returns (P, 3) int32. Start coordinates come from
    :func:`band_dp_v3_rev` on the (much smaller) winner set.
    """
    P = qT.shape[1]
    grid = P // P_STEP
    # Prefetch vector: [n_valid] ++ per-step row bounds. Accepted forms:
    # None / int / (1,) array (no bounds known → every step runs all
    # ``bucket`` rows) or a (1 + grid,) array carrying real bounds.
    if n_valid is None:
        n_valid = P
    nv = jnp.asarray(n_valid, jnp.int32).reshape(-1)
    if nv.shape[0] == 1 + grid:
        prefetch = nv
    else:
        prefetch = jnp.concatenate(
            [nv[:1], jnp.full((grid,), bucket, jnp.int32)]
        )
    assert P % P_STEP == 0 and band % 128 == 0 and bucket % 8 == 0
    assert bucket < (1 << 15) and bucket + band < (1 << 16)
    assert qT.shape == (bucket, P) and tT.shape == (bucket + band, P)
    # Above this window size the pipelined (bucket, 128) VMEM input blocks
    # (double-buffered, x2 inputs) no longer fit scoped VMEM; switch to
    # HBM-resident inputs with on-demand (8, 128) tile DMA.
    hbm = bucket > 8192 and not interpret
    kernel = functools.partial(
        _kernel, band=band, bucket=bucket, params=params,
        interpret=interpret, hbm=hbm,
    )
    if hbm:
        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        scratch_shapes = [
            pltpu.VMEM((32, P_STEP), jnp.int8),
            pltpu.VMEM((32, P_STEP), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        in_specs = [
            pl.BlockSpec((bucket, P_STEP), lambda n, *_: (0, n)),
            pl.BlockSpec((bucket + band, P_STEP), lambda n, *_: (0, n)),
        ]
        scratch_shapes = []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P // P_STEP,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((8, P_STEP), lambda n, *_: (0, n))
            for _ in range(3)
        ],
        scratch_shapes=scratch_shapes,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((8, P), jnp.int32) for _ in range(3)
        ],
        interpret=interpret,
    )(prefetch, qT, tT)
    score, qe, te = (o[0] for o in outs)
    return jnp.stack([score, qe, te], axis=1)


def band_dp_v3_rev(
    qT: jnp.ndarray,
    tT: jnp.ndarray,
    bucket: int,
    band: int,
    params: DPParams = DPParams(),
    n_valid=None,
    interpret: bool = False,
):
    """Reverse pass: per problem (score, qs, ts) — starts of an optimal
    alignment inside the (already end-clamped) windows.

    The caller must have masked qT beyond qe (m' = qe + 1) and tT beyond te
    (t_hi' = t_start + te + 1). Flipping both matrices makes every window
    suffix-aligned; leading sentinel rows cannot score, so the flipped
    problem's best END is the original problem's best START.
    """
    TW = bucket + band
    qT_r = jnp.flip(qT, axis=0)
    # One extra row of flip-shift keeps the band offset k'' = B-1-k inside
    # [0, band); the wrapped row is never read (i''+k'' <= TW-2).
    tT_r = jnp.roll(jnp.flip(tT, axis=0), -1, axis=0)
    out = band_dp_v3_fwd(
        qT_r, tT_r, bucket, band, params, n_valid=n_valid,
        interpret=interpret,
    )
    score = out[:, 0]
    qs = (bucket - 1) - out[:, 1]
    ts = (TW - 2) - out[:, 2]
    return jnp.stack([score, qs, ts], axis=1)


#: Standalone-jitted passes: their signatures contain only the (bucket, P)
#: window matrices, whose shape classes are stable across read chunks, so
#: the expensive Mosaic compile is never re-triggered by chunk-size jitter
#: (see align/device.py window_score_v3_fwd).
band_dp_v3_fwd_jit = functools.partial(
    jax.jit, static_argnames=("bucket", "band", "params", "interpret")
)(band_dp_v3_fwd)
band_dp_v3_rev_jit = functools.partial(
    jax.jit, static_argnames=("bucket", "band", "params", "interpret")
)(band_dp_v3_rev)


@functools.partial(
    jax.jit, static_argnames=("bucket", "band", "params", "interpret")
)
def band_dp_v3(
    qT: jnp.ndarray,
    tT: jnp.ndarray,
    bucket: int,
    band: int,
    params: DPParams = DPParams(),
    interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Two-pass convenience wrapper returning the band_dp_batch contract.

    Production code runs the passes separately (the reverse pass only on
    winners); this wrapper exists for tests and parity checks.
    """
    fwd = band_dp_v3_fwd(qT, tT, bucket, band, params, interpret=interpret)
    score, qe, te = fwd[:, 0], fwd[:, 1], fwd[:, 2]
    rows = jnp.arange(bucket, dtype=jnp.int32)[:, None]
    qT2 = jnp.where(rows <= qe[None, :], qT, jnp.int8(4))
    trows = jnp.arange(bucket + band, dtype=jnp.int32)[:, None]
    tT2 = jnp.where(trows <= te[None, :], tT, jnp.int8(4))
    rev = band_dp_v3_rev(qT2, tT2, bucket, band, params, interpret=interpret)
    return {
        "score": score,
        "qs": rev[:, 1],
        "ts": rev[:, 2],
        "qe": qe,
        "te": te,
        "score_rev": rev[:, 0],
    }
