"""Pallas band-DP kernel vs the XLA scan reference implementation."""

import numpy as np
import pytest

from svjedi_tpu.align.extend import DPParams, band_dp_batch
from svjedi_tpu.kernels.band_dp import band_dp_pallas


@pytest.mark.parametrize("seed", [0])
def test_pallas_matches_reference(seed):
    # One small case: interpret mode runs the kernel in pure Python, so this
    # is minutes-per-case; broader shape coverage runs compiled on TPU
    # (bench.py asserts kernel-vs-reference equality on real batches).
    rng = np.random.default_rng(seed)
    P, M, B = 8, 128, 128
    q = rng.integers(0, 5, size=(P, M)).astype(np.int8)
    t = np.full((P, M + B), 4, dtype=np.int8)
    for p in range(P):
        # target = noisy copy of the read placed at a random offset
        off = int(rng.integers(0, B))
        copy = q[p].copy()
        flips = rng.random(M) < 0.1
        copy[flips] = rng.integers(0, 4, size=int(flips.sum()))
        t[p, off : off + M] = copy

    ref = band_dp_batch(q, t, B, DPParams())
    ours = band_dp_pallas(q, t, B, DPParams(), interpret=True)
    # Scores must be identical. Spans may differ only when several optimal
    # alignments tie (the kernel tracks per-lane bests and reduces at the
    # end, so its tie order differs from the scan's per-row argmax); on
    # random data that is <1% of problems.
    np.testing.assert_array_equal(
        np.asarray(ours["score"]), np.asarray(ref["score"])
    )
    span_match = np.ones(P, dtype=bool)
    for key in ("qs", "ts", "qe", "te"):
        span_match &= np.asarray(ours[key]) == np.asarray(ref[key])
    assert span_match.mean() >= 0.9
