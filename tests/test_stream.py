"""Streaming read loader (io.fastq.ReadStream + native svt_stream_*).

The Gb-genome path: reads are pulled in fixed-size chunks so
reads-resident memory is O(chunk) (PERF.md Gb plan item 1). Contract
under test: a streamed run is BYTE-IDENTICAL to an eager one — same
records, same chunk boundaries (including the pipeline-fill ramp rule),
same counts out of align_and_count.
"""

import gzip

import numpy as np
import pytest

from conftest import require_reference, TEST_DATA

from svjedi_tpu.io.fastq import ReadSet, ReadStream, read_reads


def _write_fastq(path, n_reads, seed=0, gz=False):
    rng = np.random.default_rng(seed)
    opener = gzip.open if gz else open
    with opener(path, "wt") as fh:
        for i in range(n_reads):
            ln = int(rng.integers(20, 200))
            seq = "".join("ACGTN"[j] for j in rng.integers(0, 5, ln))
            fh.write(f"@read{i} extra meta\n{seq}\n+\n{'I' * ln}\n")
    return path


def _concat(chunks):
    names, codes, lengths = [], [], []
    for c in chunks:
        names.extend(c.names)
        codes.append(c.codes)
        lengths.extend(np.diff(c.offsets).tolist())
    codes = (
        np.concatenate(codes) if codes else np.zeros(0, np.int8)
    )
    offsets = np.zeros(len(names) + 1, np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return ReadSet(names=names, codes=codes, offsets=offsets)


def test_stream_equals_eager_golden_bundle():
    """Native stream over the reference fastq.gz == whole-file reader."""
    require_reference()
    path = str(TEST_DATA / "simulated_reads.fastq.gz")
    eager = read_reads(path)
    stream = ReadStream(path)
    got = _concat(stream.chunks(64))
    assert got.names == eager.names
    assert np.array_equal(got.codes, eager.codes)
    assert np.array_equal(got.offsets, eager.offsets)
    # Post-iteration global views used by GAF export / stats.
    assert stream.n_reads == eager.n_reads
    assert stream.names == eager.names
    assert np.array_equal(stream.lengths, eager.lengths)
    assert stream.total_bases == int(eager.codes.size)


@pytest.mark.parametrize("gz", [False, True])
def test_stream_matches_python_fallback(tmp_path, gz):
    """Native and pure-Python streaming produce identical chunks."""
    p = _write_fastq(tmp_path / ("r.fastq" + (".gz" if gz else "")), 37, gz=gz)
    eager = read_reads(str(p))
    got = _concat(ReadStream(str(p)).chunks(10))
    assert got.names == eager.names
    assert np.array_equal(got.codes, eager.codes)
    assert np.array_equal(got.offsets, eager.offsets)


def test_stream_multi_file(tmp_path):
    """Comma-separated files concatenate in order (svjedi-graph.py:95-105)."""
    p1 = _write_fastq(tmp_path / "a.fastq", 7, seed=1)
    p2 = _write_fastq(tmp_path / "b.fastq", 5, seed=2)
    paths = f"{p1},{p2}"
    eager = read_reads(paths)
    got = _concat(ReadStream(paths).chunks(4))
    assert got.names == eager.names
    assert np.array_equal(got.codes, eager.codes)


@pytest.mark.parametrize(
    "n,chunk,first",
    [
        (519, 128, 32),   # ramp applies
        (100, 128, 32),   # single chunk (n <= chunk)
        (128, 128, 32),   # boundary: exactly one chunk
        (129, 128, 32),   # boundary: ramp kicks in
        (50, 8, 2),       # many chunks
        (9, 8, 2),
        (1, 8, 2),
    ],
)
def test_stream_chunk_boundaries_match_eager_rule(tmp_path, n, chunk, first):
    """Chunk sizes replicate align_and_count's eager slicing exactly."""
    p = _write_fastq(tmp_path / "r.fastq", n, seed=n)
    eager = read_reads(str(p))
    sizes = [c.n_reads for c in ReadStream(str(p)).chunks(chunk, first=first)]
    # The eager rule from align/pipeline.py.
    starts = [0]
    nxt = first if n > chunk else chunk
    while nxt < n:
        starts.append(nxt)
        nxt += chunk
    bounds = starts + [n]
    expect = [b - a for a, b in zip(bounds[:-1], bounds[1:])]
    assert sizes == expect
    assert sum(sizes) == eager.n_reads


def test_stream_single_pass(tmp_path):
    p = _write_fastq(tmp_path / "r.fastq", 5)
    s = ReadStream(str(p))
    list(s.chunks(4))
    with pytest.raises(RuntimeError):
        list(s.chunks(4))


def test_align_and_count_stream_equals_eager():
    """Full align stage: streamed reads reproduce eager counts exactly."""
    require_reference()
    from svjedi_tpu.align.index import build_panel_index
    from svjedi_tpu.align.pipeline import align_and_count
    from svjedi_tpu.config import AlignConfig, GenotypeConfig
    from svjedi_tpu.graph.build import build_graph
    from svjedi_tpu.graph.cluster import build_panel
    from svjedi_tpu.graph.svparse import parse_vcf_svs
    from svjedi_tpu.io.fasta import read_fasta

    cfg = AlignConfig(decoy=False)  # keep the CPU run fast; decoy is
    gcfg = GenotypeConfig()         # chunk-independent either way
    chroms = read_fasta(TEST_DATA / "reference_genome.fasta")
    parsed = parse_vcf_svs(
        TEST_DATA / "test.vcf", {c: len(s) for c, s in chroms.items()}
    )
    graph = build_graph(chroms, parsed)
    panel = build_panel(graph, flank=cfg.flank, cluster_gap=cfg.cluster_gap,
                        max_paths_per_cluster=cfg.max_paths_per_cluster)
    index = build_panel_index(panel, k=cfg.kmer, w=cfg.window,
                              max_hits_per_minimizer=cfg.max_hits_per_minimizer)
    path = str(TEST_DATA / "simulated_reads.fastq.gz")
    eager = read_reads(path)
    counts_e, audit_e, w_e = align_and_count(
        eager, panel, index, cfg, gcfg, chunk_reads=128
    )
    stream = ReadStream(path)
    counts_s, audit_s, w_s = align_and_count(
        stream, panel, index, cfg, gcfg, chunk_reads=128
    )
    assert counts_s == counts_e
    assert audit_s == audit_e
    assert np.array_equal(w_s.read, w_e.read)
    assert np.array_equal(w_s.score, w_e.score)
    assert stream.n_reads == eager.n_reads
