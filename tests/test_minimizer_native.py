"""Native minimizer scan == numpy reference (align/minimizer.py).

The native scan (native/fastio.cpp scan_minimizers, branchless two-pass
block-min) must emit exactly the set the numpy per-read extractor selects:
leftmost argmin per w-window of fmix32(canonical k-mer) with N-containing
and palindromic k-mers invalid, deduped, position-sorted. Edge cases: reads
shorter than k, reads with fewer than w k-mers (single all-k-mer window),
N runs splitting a read, and palindromic (fwd == rc) k-mers.
"""

import numpy as np
import pytest

from svjedi_tpu.align.minimizer import extract_minimizers
from svjedi_tpu.utils.native import load_native


def _encode(seq: str) -> np.ndarray:
    lut = {b: i for i, b in enumerate("ACGT")}
    return np.array([lut.get(c, 4) for c in seq], dtype=np.int8)


def _native_scan(native, reads, k, w, bitmap=None, bitmap_log2=0):
    codes = np.concatenate(reads) if reads else np.zeros(0, np.int8)
    offsets = np.concatenate(
        [[0], np.cumsum([len(r) for r in reads])]
    ).astype(np.int64)
    return native.minimizers(
        codes, offsets, k, w, bitmap=bitmap, bitmap_log2=bitmap_log2,
        n_threads=2,
    )


@pytest.mark.parametrize("k,w", [(15, 10), (11, 5), (15, 1)])
def test_native_scan_matches_numpy_per_read(k, w):
    native = load_native()
    if native is None:
        pytest.skip("native library not built")
    rng = np.random.default_rng(7)
    reads = []
    for ln in [5, k - 1, k, k + 1, k + w - 2, k + w - 1, 200, 1999, 12345]:
        reads.append(rng.integers(0, 4, ln).astype(np.int8))
    # N runs: leading, interior, trailing, and an all-N read.
    nread = rng.integers(0, 4, 400).astype(np.int8)
    nread[:20] = 4
    nread[100:130] = 4
    nread[-5:] = 4
    reads.append(nread)
    reads.append(np.full(50, 4, dtype=np.int8))
    # Palindrome-rich read: AT repeats make fwd == rc k-mers for odd k? For
    # k odd a perfect palindrome cannot occur, so also include a k=14-style
    # repeat that maximizes near-ties.
    reads.append(_encode("AT" * 300))
    reads.append(_encode("ACGT" * 250))

    rid, pos, hsh, strand = _native_scan(native, reads, k, w)

    exp_rid, exp_pos, exp_hash, exp_strand = [], [], [], []
    for i, r in enumerate(reads):
        m = extract_minimizers(r, k, w)
        exp_rid.extend([i] * len(m.pos))
        exp_pos.extend(m.pos.tolist())
        exp_hash.extend(m.hash.tolist())
        exp_strand.extend(m.strand.tolist())

    np.testing.assert_array_equal(rid, np.asarray(exp_rid, np.int32))
    np.testing.assert_array_equal(pos, np.asarray(exp_pos, np.int32))
    np.testing.assert_array_equal(hsh, np.asarray(exp_hash, np.uint32))
    np.testing.assert_array_equal(strand, np.asarray(exp_strand, np.int8))


def test_native_scan_bitmap_filter_is_exact_subset():
    native = load_native()
    if native is None:
        pytest.skip("native library not built")
    rng = np.random.default_rng(3)
    reads = [rng.integers(0, 4, 3000).astype(np.int8) for _ in range(8)]
    k, w, log2 = 15, 10, 20
    _, pos_all, hash_all, _ = _native_scan(native, reads, k, w)
    # Bitmap admitting every other distinct hash.
    uniq = np.unique(hash_all)
    admitted = set(uniq[::2].tolist())
    bm = np.zeros(1 << (log2 - 3), dtype=np.uint8)
    bits = np.array(sorted(admitted), dtype=np.uint32) & np.uint32(
        (1 << log2) - 1
    )
    np.bitwise_or.at(
        bm, (bits >> np.uint32(3)).astype(np.int64),
        (np.uint8(1) << (bits & np.uint32(7)).astype(np.uint8)),
    )
    _, pos_f, hash_f, _ = _native_scan(
        native, reads, k, w, bitmap=bm, bitmap_log2=log2
    )
    masked = {int(h) & ((1 << log2) - 1) for h in admitted}
    keep = np.array(
        [int(h) & ((1 << log2) - 1) in masked for h in hash_all]
    )
    np.testing.assert_array_equal(pos_f, pos_all[keep])
    np.testing.assert_array_equal(hash_f, hash_all[keep])


def test_native_lookup_table_matches_binary_search():
    """svt_chain3 with a prebuilt hash table == svt_chain2 binary search."""
    native = load_native()
    if native is None or not hasattr(native._lib, "svt_chain3"):
        pytest.skip("native library predates svt_chain3")
    from svjedi_tpu.align.index import build_panel_index
    from svjedi_tpu.align.seed import ChainParams
    from svjedi_tpu.graph.build import build_graph
    from svjedi_tpu.graph.cluster import build_panel
    from svjedi_tpu.graph.svparse import parse_vcf_svs
    from svjedi_tpu.io.fasta import read_fasta

    from conftest import TEST_DATA, require_reference

    require_reference()
    chroms = read_fasta(TEST_DATA / "reference_genome.fasta")
    parsed = parse_vcf_svs(
        TEST_DATA / "test.vcf", {c: len(s) for c, s in chroms.items()}
    )
    graph = build_graph(chroms, parsed)
    panel = build_panel(graph)
    index = build_panel_index(panel)
    from svjedi_tpu.io.fastq import read_reads

    reads = read_reads(str(TEST_DATA / "simulated_reads.fastq.gz"))
    cp = ChainParams()
    kw = dict(
        bitmap=index.hash_bitmap(), bitmap_log2=index.BITMAP_LOG2,
        uniq_hash=index.uniq_hash, hit_start=index.hit_start,
        hit_path=index.hit_path, hit_pos=index.hit_pos,
        hit_strand=index.hit_strand, params=cp, n_threads=2,
    )
    res_bs = native.chain(reads.codes, reads.offsets, index.k, index.w, **kw)
    handle = index.native_lookup()
    assert handle != 0
    res_lut = native.chain(
        reads.codes, reads.offsets, index.k, index.w, lookup=handle, **kw
    )
    assert len(res_bs[0]) > 0
    for a, b in zip(res_bs, res_lut):
        np.testing.assert_array_equal(a, b)


def test_tiled_extraction_equals_untiled(monkeypatch):
    """The large-sequence tiled path must reproduce the whole-array
    extraction EXACTLY (positions, hashes, strands) — tile boundaries
    fall mid-window, which is precisely the case the halo covers."""
    import svjedi_tpu.align.minimizer as mz

    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, size=200_003, dtype=np.int8)
    # N runs straddling future tile boundaries
    for start in (9_990, 49_995, 120_000):
        codes[start : start + 12] = 4
    k, w = 15, 10
    ref = mz.extract_minimizers(codes, k, w)

    monkeypatch.setattr(mz, "_TILE_WINDOWS", 10_000)  # ~20 tiles
    tiled = mz.extract_minimizers(codes, k, w)
    # (the monkeypatched threshold forces the tiled branch)
    np.testing.assert_array_equal(ref.pos, tiled.pos)
    np.testing.assert_array_equal(ref.hash, tiled.hash)
    np.testing.assert_array_equal(ref.strand, tiled.strand)


def test_tiled_threshold_edge(monkeypatch):
    """Exactly at/just past the threshold both paths agree (off-by-one
    guard on the n_windows > _TILE_WINDOWS branch condition)."""
    import svjedi_tpu.align.minimizer as mz

    rng = np.random.default_rng(11)
    k, w = 15, 10
    monkeypatch.setattr(mz, "_TILE_WINDOWS", 5_000)
    for n_windows in (4_999, 5_000, 5_001, 10_001):
        n = n_windows + w - 1 + k - 1
        codes = rng.integers(0, 4, size=n, dtype=np.int8)
        got = mz.extract_minimizers(codes, k, w)
        ref = mz._extract_tiled(codes, k, w)
        np.testing.assert_array_equal(got.pos, ref.pos)
        np.testing.assert_array_equal(got.hash, ref.hash)
        np.testing.assert_array_equal(got.strand, ref.strand)
