"""Optimal-span validation for kernel tests.

When two engines disagree on alignment span endpoints, the disagreement is
only acceptable if BOTH spans are optimal-alignment spans: clamping the
problem to the claimed rectangle must still attain the full optimal score
(VERDICT r1 item 9 — a blind mismatch budget would let a real
start-coordinate bug hide inside the tolerance).
"""

import numpy as np

from svjedi_tpu.align.extend import DPParams, band_dp_batch


def assert_spans_optimal(q, t, band, params: DPParams, out, rows) -> None:
    """For each problem row, clamp (q, t) to out's claimed span and assert
    the clamped optimum equals the claimed score.

    ``out`` carries score/qs/ts/qe/te in window coordinates (the
    band_dp_batch contract); ``rows`` selects the problems to validate.
    """
    rows = np.asarray(rows)
    if rows.size == 0:
        return
    score = np.asarray(out["score"])
    qs, qe = np.asarray(out["qs"]), np.asarray(out["qe"])
    ts, te = np.asarray(out["ts"]), np.asarray(out["te"])
    M = q.shape[1]
    TW = t.shape[1]
    qc = q[rows].copy()
    tc = t[rows].copy()
    cols_q = np.arange(M)[None, :]
    cols_t = np.arange(TW)[None, :]
    qc[(cols_q < qs[rows, None]) | (cols_q > qe[rows, None])] = 4
    tc[(cols_t < ts[rows, None]) | (cols_t > te[rows, None])] = 4
    clamped = band_dp_batch(qc, tc, band, params)
    np.testing.assert_array_equal(
        np.asarray(clamped["score"]),
        score[rows],
        err_msg="a disagreeing span does not attain the optimal score",
    )
