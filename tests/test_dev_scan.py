"""On-device minimizer scan == native scan (align/dev_scan.py).

The jitted XLA scan emits a packed bitmask of minimizer k-mer start
positions; it must reproduce the native per-read emission SET — same
positions, in read-major position-sorted order — including N
invalidation, palindrome drops, and read-boundary isolation. Reads
shorter than k+w-1 bases keep all bits clear by design (native
``svt_chain5`` scans them host-side), so their native emissions are
excluded from the set comparison and checked separately through the
full chain5 == host-chain candidate parity test.
"""

import numpy as np
import pytest

from svjedi_tpu.align import dev_scan
from svjedi_tpu.align import device as dev
from svjedi_tpu.utils.native import load_native


def _encode(seq: str) -> np.ndarray:
    lut = {b: i for i, b in enumerate("ACGT")}
    return np.array([lut.get(c, 4) for c in seq], dtype=np.int8)


class _FakePanel:
    paths = []


def _concat(reads):
    codes = np.concatenate(reads) if reads else np.zeros(0, np.int8)
    offsets = np.concatenate(
        [[0], np.cumsum([len(r) for r in reads])]
    ).astype(np.int64)
    return codes, offsets


def _device_bitmask(codes, offsets, k, w) -> np.ndarray:
    dd = dev.upload(codes, _FakePanel(), {}, offsets=offsets)
    out = dev_scan.dispatch_scan(dd, k, w)
    return dev_scan.fetch_bitmask(out)


def _native_long_read_positions(native, codes, offsets, k, w):
    """Native emission (read_id, pos) restricted to reads with >= w
    k-mers — the set the device bitmask is defined over."""
    m_read, m_pos, _, _ = native.minimizers(codes, offsets, k, w,
                                            n_threads=2)
    n_kmers = np.diff(offsets) - k + 1
    keep = n_kmers[m_read] >= w
    return m_read[keep], m_pos[keep]


@pytest.mark.parametrize("k,w", [(15, 10), (11, 5)])
def test_device_bitmask_matches_native_emission(k, w):
    native = load_native()
    if native is None:
        pytest.skip("native library not built")
    rng = np.random.default_rng(11)
    reads = []
    for ln in [5, k - 1, k, k + 1, k + w - 2, k + w - 1, 200, 1999, 7777]:
        reads.append(rng.integers(0, 4, ln).astype(np.int8))
    nread = rng.integers(0, 4, 500).astype(np.int8)
    nread[:25] = 4
    nread[200:260] = 4
    nread[-3:] = 4
    reads.append(nread)
    reads.append(np.full(60, 4, dtype=np.int8))
    reads.append(_encode("AT" * 200))  # all-palindromic k-mers for odd k
    reads.append(_encode("ACGT" * 300))

    codes, offsets = _concat(reads)
    bits = _device_bitmask(codes, offsets, k, w)
    got_read, got_pos = dev_scan.bitmask_positions(bits, offsets)
    exp_read, exp_pos = _native_long_read_positions(
        native, codes, offsets, k, w
    )
    np.testing.assert_array_equal(got_read, exp_read)
    np.testing.assert_array_equal(got_pos, exp_pos)

    # Short reads (< w k-mers) must have every bit clear.
    n_kmers = np.diff(offsets) - k + 1
    assert not np.isin(got_read, np.flatnonzero(n_kmers < w)).any()


def test_device_bitmask_testdir_reads_full_parity():
    """Production shapes: the reference test-dir read set against the
    native scan the pipeline used before."""
    from pathlib import Path

    from svjedi_tpu.io.fastq import read_reads

    native = load_native()
    if native is None:
        pytest.skip("native library not built")
    fq = Path("/root/reference/test-dir/simulated_reads.fastq.gz")
    if not fq.exists():
        pytest.skip("reference test-dir not available")
    reads = read_reads(str(fq))
    k, w = 15, 10
    bits = _device_bitmask(reads.codes, reads.offsets, k, w)
    got_read, got_pos = dev_scan.bitmask_positions(bits, reads.offsets)
    exp_read, exp_pos = _native_long_read_positions(
        native, reads.codes, reads.offsets, k, w
    )
    np.testing.assert_array_equal(got_read, exp_read)
    np.testing.assert_array_equal(got_pos, exp_pos)


def test_chain_from_bitmask_matches_host_chain():
    """End-to-end: seed_candidates(bits=device bitmask) == the full host
    scan+chain path, on a merged panel+decoy index with the panel-path
    limit — the exact production configuration of the device-seed path
    (align/pipeline.py seed_chunk). Covers svt_chain5's host-side bitmap
    filter, hash/strand recomputation, and short-read native fallback."""
    import os
    import tempfile

    from svjedi_tpu.align.decoy import build_decoy
    from svjedi_tpu.align.index import build_panel_index, merge_indexes
    from svjedi_tpu.align.seed import ChainParams, seed_candidates
    from svjedi_tpu.config import AlignConfig
    from svjedi_tpu.graph.build import build_graph
    from svjedi_tpu.graph.cluster import build_panel
    from svjedi_tpu.graph.svparse import parse_vcf_svs
    from svjedi_tpu.io import sim
    from svjedi_tpu.io.fastq import ReadSet, encode_ascii

    native = load_native()
    if native is None or not hasattr(native._lib, "svt_chain5"):
        pytest.skip("native svt_chain5 not built")
    cfg = AlignConfig()
    rng = np.random.default_rng(15)
    s = sim.simulate(seed=16, chrom_lengths={"c1": 120_000}, n_svs=6)
    names, seqs = sim.simulate_reads(
        rng, s.haplotypes, coverage=5.0, mean_len=3000, sd_len=800
    )
    # A few sub-threshold reads to force the short-read native fallback.
    seqs = list(seqs) + ["ACGTACGTACGTACGTACG", "A" * (cfg.kmer + 1)]
    names = list(names) + ["short1", "short2"]
    with tempfile.TemporaryDirectory() as tmp:
        vcf = os.path.join(tmp, "t.vcf")
        sim.write_truth_vcf(s, vcf)
        parsed = parse_vcf_svs(
            vcf, {c: len(x) for c, x in s.chroms.items()}
        )
    graph = build_graph(s.chroms, parsed)
    panel = build_panel(graph, flank=cfg.flank, cluster_gap=cfg.cluster_gap)
    index = build_panel_index(panel, k=cfg.kmer, w=cfg.window)
    decoy = build_decoy(panel, k=cfg.kmer, w=cfg.window)
    combo = merge_indexes(index, decoy.index)
    codes = np.concatenate([encode_ascii(x) for x in seqs])
    offsets = np.concatenate(
        [[0], np.cumsum([len(x) for x in seqs])]
    ).astype(np.int64)
    reads = ReadSet(names=names, codes=codes, offsets=offsets)
    n_panel = len(index.path_len)

    bits = _device_bitmask(reads.codes, reads.offsets, cfg.kmer, cfg.window)
    cp = ChainParams()
    via_dev = seed_candidates(
        reads, combo, chain_params=cp, panel_path_limit=n_panel, bits=bits
    )
    via_host = seed_candidates(
        reads, combo, chain_params=cp, panel_path_limit=n_panel
    )
    assert len(via_host) > 0
    for f in ("read", "path", "strand", "d0", "n_anchors", "chain",
              "q_lo", "q_hi", "a_lo", "a_hi"):
        np.testing.assert_array_equal(
            getattr(via_dev, f), getattr(via_host, f), err_msg=f
        )


def test_scan_cap_classes():
    """Quarter-octave scan caps: always >= n_codes, multiple of 8,
    bounded by the buffer cap, and only O(log) distinct per octave."""
    from svjedi_tpu.align.dev_scan import _scan_cap

    for n in [1, 7, 8, 9, 31, 32, 33, 100, 4095, 4096, 4097,
              1 << 20, (1 << 20) + 1, 5 << 18, 17_200_000]:
        n_cap = 1 << max(12, (max(n, 1) - 1).bit_length())
        cap = _scan_cap(n, n_cap)
        assert cap >= min(n, n_cap), (n, cap)
        assert cap % 8 == 0, (n, cap)
        assert cap <= n_cap, (n, cap)
    # The padding waste is bounded by 25% (vs 100% for pow2 classes).
    n = 17_200_000
    assert _scan_cap(n, 1 << 25) <= int(n * 1.25)
