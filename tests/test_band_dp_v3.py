"""v3 lane-parallel band-DP kernel vs the XLA scan reference.

Covers both the kernel semantics (transposed windows, G band groups across
lanes) and the packed-word window prep (align/device._prep_v3_windows):
sentinel masking for window tails, path bounds, and N bases must reproduce
exactly what the gather engine feeds band_dp_batch.
"""

import numpy as np
import pytest

from svjedi_tpu.align.extend import DPParams, band_dp_batch


def test_v3_matches_reference():
    from svjedi_tpu.kernels.band_dp_v3 import band_dp_v3

    rng = np.random.default_rng(1)
    P, M, B = 128, 128, 128
    q = rng.integers(0, 5, size=(P, M)).astype(np.int8)
    t = np.full((P, M + B), 4, dtype=np.int8)
    for p in range(P):
        off = int(rng.integers(0, B))
        copy = q[p].copy()
        flips = rng.random(M) < 0.1
        copy[flips] = rng.integers(0, 4, size=int(flips.sum()))
        t[p, off : off + M] = copy

    ref = band_dp_batch(q, t, B, DPParams())
    ours = band_dp_v3(q.T.copy(), t.T.copy(), M, B, DPParams(), interpret=True)
    np.testing.assert_array_equal(
        np.asarray(ours["score"]), np.asarray(ref["score"])
    )
    span_match = np.ones(P, dtype=bool)
    for key in ("qs", "ts", "qe", "te"):
        span_match &= np.asarray(ours[key]) == np.asarray(ref[key])
    assert span_match.mean() >= 0.9
    # Every disagreeing span must still be an optimal-alignment span:
    # clamping the problem to the claimed rectangle attains the full score.
    from _span_check import assert_spans_optimal

    assert_spans_optimal(
        q, t, B, DPParams(), ours, np.flatnonzero(~span_match)
    )


def test_prep_v3_windows_matches_gather():
    """Packed-word window prep == the byte-accurate gather windows."""
    import jax.numpy as jnp

    from svjedi_tpu.align import device as dev

    rng = np.random.default_rng(2)
    L = 2048  # multiple of ALIGN not required for prep itself; use 32x
    reads2 = rng.integers(0, 4, L, dtype=np.int8)
    reads2[rng.integers(0, L, 13)] = 4  # interior N bases
    panel = rng.integers(0, 4, L, dtype=np.int8)
    panel[:40] = 4
    P, bucket, band = 8, 128, 128
    q_start = rng.integers(0, L - bucket - 1, P).astype(np.int32)
    m = rng.integers(10, bucket + 1, P).astype(np.int32)
    t_start = rng.integers(0, L - bucket - band - 1, P).astype(np.int32)
    t_lo = np.maximum(t_start - 5, 0).astype(np.int32)
    t_hi = np.minimum(
        t_start + rng.integers(50, bucket + band, P), L
    ).astype(np.int32)
    meta = np.stack([q_start, m, t_start, t_lo, t_hi]).astype(np.int32)

    qT, tT = dev._prep_v3_windows(
        jnp.asarray(reads2), jnp.asarray(panel), jnp.asarray(meta),
        bucket, band,
    )
    qT, tT = np.asarray(qT), np.asarray(tT)

    # Reference: plain byte windows with the gather-engine masking rules.
    for p in range(P):
        qs = reads2[q_start[p] : q_start[p] + bucket].copy()
        qs[m[p] :] = 4
        np.testing.assert_array_equal(qT[:, p], qs, err_msg=f"q p={p}")
        idx = t_start[p] + np.arange(bucket + band)
        ts = np.where(
            (idx >= t_lo[p]) & (idx < t_hi[p]) & (idx < L),
            panel[np.clip(idx, 0, L - 1)],
            4,
        ).astype(np.int8)
        np.testing.assert_array_equal(tT[:, p], ts, err_msg=f"t p={p}")


def test_prep_v3_flat_matches_meta_path():
    """Flat-buffer prep (static offset slices) == the (5, P) meta prep."""
    import jax.numpy as jnp

    from svjedi_tpu.align import device as dev

    rng = np.random.default_rng(5)
    L = 2048
    reads2 = rng.integers(0, 4, L, dtype=np.int8)
    panel = rng.integers(0, 4, L, dtype=np.int8)
    rw, rn = dev._pack_words_jit(jnp.asarray(reads2))
    pw, pn = dev._pack_words_jit(jnp.asarray(panel))
    bucket, band = 128, 128

    blocks, plans, off = [], [], 0
    metas = []
    for P, nv in ((128, 5), (256, 250)):
        q_start = rng.integers(0, L - bucket - 1, P).astype(np.int32)
        m = rng.integers(10, bucket + 1, P).astype(np.int32)
        t_start = rng.integers(0, L - bucket - band - 1, P).astype(np.int32)
        t_lo = np.maximum(t_start - 5, 0).astype(np.int32)
        t_hi = np.minimum(t_start + 200, L).astype(np.int32)
        meta = np.stack([q_start, m, t_start, t_lo, t_hi]).astype(np.int32)
        metas.append(meta)
        blocks.append(dev.flat_meta_block(meta, nv))
        plans.append((off, P, nv))
        off += dev.flat_block_len(P)
    flat = dev.upload_flat_meta(blocks)

    for (off_b, P, nv), meta in zip(plans, metas):
        qT, tT, got_nvb = dev._prep_v3_flat_jit(
            rw, rn, pw, pn, flat, off=off_b, Ppad=P, bucket=bucket,
            band=band,
        )
        ref_qT, ref_tT = dev._prep_v3_windows_packed_jit(
            rw, rn, pw, pn, jnp.asarray(meta), bucket=bucket, band=band
        )
        got_nvb = np.asarray(got_nvb)
        assert int(got_nvb[0]) == nv
        # default row bounds = per-128-group max window length
        np.testing.assert_array_equal(
            got_nvb[1:], meta[1].reshape(-1, 128).max(axis=1)
        )
        np.testing.assert_array_equal(np.asarray(qT), np.asarray(ref_qT))
        np.testing.assert_array_equal(np.asarray(tT), np.asarray(ref_tT))


def test_fwd_row_bounds_match_unbounded():
    """Per-step row bounds (rows >= bound sentinel) == full-bucket run."""
    import jax.numpy as jnp

    from svjedi_tpu.align.extend import DPParams
    from svjedi_tpu.kernels.band_dp_v3 import band_dp_v3_fwd

    rng = np.random.default_rng(9)
    bucket, band, P = 256, 128, 128
    m = np.sort(rng.integers(32, bucket + 1, P)).astype(np.int32)
    qT = rng.integers(0, 4, (bucket, P), dtype=np.int8)
    tT = rng.integers(0, 4, (bucket + band, P), dtype=np.int8)
    rows = np.arange(bucket)[:, None]
    qT = np.where(rows < m[None, :], qT, 4).astype(np.int8)

    full = band_dp_v3_fwd(
        jnp.asarray(qT), jnp.asarray(tT), bucket, band, DPParams(),
        n_valid=P, interpret=True,
    )
    nvb = jnp.asarray(
        np.concatenate([[P], [int(m.max())]]).astype(np.int32)
    )
    bounded = band_dp_v3_fwd(
        jnp.asarray(qT), jnp.asarray(tT), bucket, band, DPParams(),
        n_valid=nvb, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(bounded), np.asarray(full))
    # A tighter-than-max bound on the sentinel tail only is also exact:
    # bound at the true max m (rows beyond are all-sentinel by masking).
