"""Diag-bucketed chain election (fastio.cpp): bit-equality vs the linear
semantics reference on a group with MANY simultaneous chains.

A read matching a tandem-repeated unit seeds one chain per repeat locus
inside a single (read, path, strand) group — dozens of active chains at
once, which is exactly the genome-scale shape that flips the native
chainer into its bucketed election (kBucketSwitch=12). The pure-Python
seeding path is the linear-scan semantics reference; outputs must match
row for row.
"""

import numpy as np
import pytest

from svjedi_tpu.align.index import PanelIndex
from svjedi_tpu.align.minimizer import extract_minimizers
from svjedi_tpu.align.seed import ChainParams, seed_candidates
from svjedi_tpu.io.fastq import ReadSet, encode_ascii
from svjedi_tpu.utils.native import load_native


def _index_over(seq_codes, k=15, w=10):
    mins = extract_minimizers(seq_codes, k, w)
    order = np.argsort(mins.hash, kind="stable")
    h = mins.hash[order]
    uniq, start = np.unique(h, return_index=True)
    hit_start = np.append(start, len(h)).astype(np.int64)
    n = 1
    return PanelIndex(
        k=k, w=w, uniq_hash=uniq, hit_start=hit_start,
        hit_path=np.zeros(len(h), np.int32),
        hit_pos=mins.pos[order], hit_strand=mins.strand[order],
        path_cluster=np.zeros(n, np.int32),
        path_len=np.array([len(seq_codes)], np.int32),
        path_first_j=np.zeros(n, np.int32),
        path_last_j=np.array([len(seq_codes) - 1], np.int32),
    )


def _rows(c):
    return sorted(
        (
            int(c.read[i]), int(c.path[i]), int(c.strand[i]),
            int(c.d0[i]), int(c.n_anchors[i]), int(c.q_lo[i]),
            int(c.q_hi[i]), int(c.a_lo[i]), int(c.a_hi[i]),
            int(c.head_diag[i]),
        )
        for i in range(len(c))
    )


@pytest.mark.parametrize("n_repeats,spacing", [(30, 500), (50, 1200)])
def test_bucketed_election_matches_linear_reference(
    monkeypatch, n_repeats, spacing
):
    if load_native() is None:
        pytest.skip("native library not built")
    rng = np.random.default_rng(7)
    unit = rng.integers(0, 4, 120).astype(np.int8)
    parts = []
    for i in range(n_repeats):
        parts.append(unit)
        parts.append(rng.integers(0, 4, spacing).astype(np.int8))
    path = np.concatenate(parts)
    index = _index_over(path)

    # Reads: several copies of the unit plus noise tails — every repeat
    # locus yields anchors on the SAME (read, path 0, strand) group.
    reads_codes, names, lengths = [], [], []
    for r in range(6):
        read = np.concatenate([
            rng.integers(0, 4, 200).astype(np.int8),
            unit,
            rng.integers(0, 4, 300).astype(np.int8),
            unit,
            rng.integers(0, 4, 200).astype(np.int8),
        ])
        reads_codes.append(read)
        names.append(f"r{r}")
        lengths.append(len(read))
    codes = np.concatenate(reads_codes)
    offsets = np.zeros(len(names) + 1, np.int64)
    np.cumsum(lengths, out=offsets[1:])
    reads = ReadSet(names=names, codes=codes, offsets=offsets)

    # Many chains per group => the native path uses the bucketed election.
    cp = ChainParams(min_anchors=1, max_chains=1000, max_gap=4096)
    native_out = seed_candidates(reads, index, chain_params=cp)

    # Force the pure-Python linear-scan reference.
    import svjedi_tpu.align.seed as seed_mod

    monkeypatch.setattr(seed_mod, "load_native", lambda: None)
    python_out = seed_candidates(reads, index, chain_params=cp)

    assert len(native_out) > 0
    # Enough anchors landed in one group to cross the bucket switch.
    assert int(native_out.n_anchors.max()) >= 1
    assert _rows(native_out) == _rows(python_out)


def test_exotic_params_fall_back_to_linear(monkeypatch):
    """tol_cap >= bucket width disables bucketing (correctness guard)."""
    if load_native() is None:
        pytest.skip("native library not built")
    rng = np.random.default_rng(3)
    path = rng.integers(0, 4, 20000).astype(np.int8)
    index = _index_over(path)
    read = np.concatenate([path[2000:6000], rng.integers(0, 4, 500).astype(np.int8)])
    reads = ReadSet(
        names=["r0"], codes=read,
        offsets=np.array([0, len(read)], np.int64),
    )
    cp = ChainParams(min_anchors=1, max_chains=1000, drift_abs=5000)
    native_out = seed_candidates(reads, index, chain_params=cp)
    import svjedi_tpu.align.seed as seed_mod

    monkeypatch.setattr(seed_mod, "load_native", lambda: None)
    python_out = seed_candidates(reads, index, chain_params=cp)
    assert _rows(native_out) == _rows(python_out)
