"""Min-count-density gate (GenotypeConfig.min_count_density).

A winner whose score per target base falls below the threshold is a
discontinuity bridge and must contribute no crossings — in the host
count_support AND the on-mesh entry table (byte-equal rule). See
PARITY.md's attribution table for the motivating analysis.
"""

import numpy as np

from svjedi_tpu.align.pipeline import Winners, count_support
from svjedi_tpu.dist.count_merge import build_entry_table, count_entries_np
from svjedi_tpu.io.fastq import ReadSet


class _Path:
    def __init__(self, owned):
        self.owned = owned


class _Panel:
    def __init__(self):
        # One path owning one SV junction at j=500 (ref allele, link 0).
        self.paths = [_Path([("c1:DEL-1-2", 0, 500, 0)])]


def _winners(scores):
    n = len(scores)
    z = np.zeros(n, np.int64)
    return Winners(
        read=np.arange(n, dtype=np.int64),
        cluster=z.copy(),
        path=z.copy(),
        strand=z.copy(),
        score=np.asarray(scores, np.int64),
        qs=z.copy(),
        qe=np.full(n, 999, np.int64),
        ts=z.copy(),
        te=np.full(n, 999, np.int64),  # span 1000, junction margin 500
    )


def _reads(n):
    codes = np.zeros(n * 10, np.int8)
    offsets = np.arange(0, (n + 1) * 10, 10, dtype=np.int64)
    return ReadSet(
        names=[f"r{i}" for i in range(n)], codes=codes, offsets=offsets
    )


def test_density_gate_drops_low_density_winners():
    panel = _Panel()
    # densities: 1.5, 1.1, 1.099, 0.5 over a 1000-base span
    w = _winners([1500, 1100, 1099, 500])
    reads = _reads(4)
    ungated, _ = count_support(panel, w, reads, d_over=100, collect_audit=False)
    assert ungated["c1:DEL-1-2"] == [4, 0]
    gated, _ = count_support(
        panel, w, reads, d_over=100, collect_audit=False, min_density=1.1
    )
    assert gated["c1:DEL-1-2"] == [2, 0]

    # Mesh entry table applies the identical rule.
    tag_to_id = {"c1:DEL-1-2": 0}
    et = build_entry_table(panel, w, tag_to_id, n_shards=2, min_density=1.1)
    mat = count_entries_np(et, 1, 100)
    assert [int(mat[0, 0]), int(mat[0, 1])] == [2, 0]

    # All winners gated -> empty table, empty counts.
    et0 = build_entry_table(panel, w, tag_to_id, min_density=99.0)
    assert et0 is None
    g0, _ = count_support(
        panel, w, reads, d_over=100, collect_audit=False, min_density=99.0
    )
    assert g0 == {}
