"""Multi-file and format-variant read input, end to end.

Reference contract: -q takes a comma-separated list mapped sequentially
into ONE alignment stream (svjedi-graph.py:95-105); minigraph accepts
FASTA and FASTQ, plain or gzipped. Our pipeline must produce a VCF
byte-equal to the concatenated-single-file run for any split/format mix,
through BOTH the native reader and the Python fallback.
"""

import gzip

import numpy as np
import pytest

from conftest import TEST_DATA, require_reference

import svjedi_tpu.utils.native as native_mod
from svjedi_tpu.config import PipelineConfig
from svjedi_tpu.io.fastq import read_reads


def _load_fastq_records(path):
    recs = []
    with gzip.open(path, "rt") as fh:
        while True:
            h = fh.readline().strip()
            if not h:
                break
            seq = fh.readline().strip()
            fh.readline()
            qual = fh.readline().strip()
            recs.append((h[1:].split()[0], seq, qual))
    return recs


@pytest.fixture(scope="module")
def split_inputs(tmp_path_factory):
    """test-dir reads split into (a) .fq, (b) .fa.gz with CRLF + wrapped
    lines, exercising every reader branch."""
    require_reference()
    tmp = tmp_path_factory.mktemp("multiq")
    recs = _load_fastq_records(TEST_DATA / "simulated_reads.fastq.gz")
    assert len(recs) > 100
    half = len(recs) // 2
    a = tmp / "part_a.fq"
    with open(a, "w") as fh:
        for name, seq, qual in recs[:half]:
            fh.write(f"@{name}\n{seq}\n+\n{qual}\n")
    b = tmp / "part_b.fa.gz"
    with gzip.open(b, "wt", newline="") as fh:
        for name, seq, _ in recs[half:]:
            # CRLF line endings + 80-column wrapping (multi-line FASTA).
            fh.write(f">{name}\r\n")
            for i in range(0, len(seq), 80):
                fh.write(seq[i : i + 80] + "\r\n")
    return recs, a, b


def _readset_tuple(rs):
    return (
        list(rs.names),
        rs.codes.tobytes(),
        rs.offsets.tolist(),
    )


def test_readers_native_and_python_agree(split_inputs):
    recs, a, b = split_inputs
    combined = f"{a},{b}"
    rs_native = read_reads(combined)
    assert rs_native.n_reads == len(recs)
    # Names preserve order: file a then file b.
    assert rs_native.names == [n for (n, _, _) in recs]
    real = native_mod.load_native
    native_mod.load_native = lambda: None
    try:
        rs_py = read_reads(combined)
    finally:
        native_mod.load_native = real
    assert _readset_tuple(rs_native) == _readset_tuple(rs_py)
    # Concatenated single gz file gives the identical read set.
    rs_one = read_reads(str(TEST_DATA / "simulated_reads.fastq.gz"))
    assert rs_one.codes.tobytes() == rs_native.codes.tobytes()
    assert rs_one.offsets.tolist() == rs_native.offsets.tolist()


def test_pipeline_multi_fastq_byte_equal(split_inputs, tmp_path):
    recs, a, b = split_inputs
    from svjedi_tpu.pipeline import run_pipeline

    outs = {}
    for name, reads in (
        ("single", (str(TEST_DATA / "simulated_reads.fastq.gz"),)),
        ("multi", (str(a), str(b))),
    ):
        cfg = PipelineConfig(
            vcf=TEST_DATA / "test.vcf",
            ref=TEST_DATA / "reference_genome.fasta",
            reads=reads,
            prefix=str(tmp_path / name),
            keep_artifacts=False,
        )
        outs[name] = open(run_pipeline(cfg)["output_vcf"]).read()
    body = lambda s: [l for l in s.splitlines() if not l.startswith("#")]  # noqa: E731
    assert body(outs["multi"]) == body(outs["single"])
