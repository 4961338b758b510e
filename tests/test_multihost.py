"""Multi-host layer (dist/multihost.py): single-process degenerate paths.

Real pods cannot run here; these tests pin the contracts a pod run relies
on: initialize() is safe without a coordinator, the read-block split
covers the stream exactly, allreduce_counts is the identity at one
process, and a --multihost single-process pipeline run byte-reproduces
the plain run's VCF.
"""

import os
import tempfile

import numpy as np

from svjedi_tpu.dist import multihost as mh


def test_initialize_without_coordinator():
    assert mh.initialize() == (0, 1)


def test_process_read_block_single():
    assert mh.process_read_block(100) == (0, 100)


def test_allreduce_identity_single_process():
    counts = {"a": [1, 2], "b": [0, 5]}
    assert mh.allreduce_counts(counts) == counts


def _sim_inputs(tmp_path):
    from svjedi_tpu.io import sim

    rng = np.random.default_rng(2)
    s = sim.simulate(seed=8, chrom_lengths={"c1": 50_000}, n_svs=6)
    names, seqs = sim.simulate_reads(
        rng, s.haplotypes, coverage=6.0, mean_len=2500, sd_len=400
    )
    vcf = tmp_path / "t.vcf"
    fa = tmp_path / "r.fa"
    fq = tmp_path / "reads.fq"
    sim.write_truth_vcf(s, vcf)
    with open(fa, "w") as fh:
        for c, seq in s.chroms.items():
            fh.write(f">{c}\n{seq}\n")
    sim.write_fastq(fq, names, seqs)
    return vcf, fa, fq


def test_multihost_single_process_matches_plain(tmp_path):
    from svjedi_tpu.config import PipelineConfig
    from svjedi_tpu.pipeline import run_pipeline

    vcf, fa, fq = _sim_inputs(tmp_path)
    plain = run_pipeline(PipelineConfig(
        vcf=vcf, ref=fa, reads=(str(fq),),
        prefix=str(tmp_path / "plain"), keep_artifacts=False,
    ))
    multi = run_pipeline(PipelineConfig(
        vcf=vcf, ref=fa, reads=(str(fq),),
        prefix=str(tmp_path / "multi"), keep_artifacts=False,
        multihost=True,
    ))
    assert multi["output_vcf"] is not None
    a = open(plain["output_vcf"]).read()
    b = open(multi["output_vcf"]).read()
    assert a == b


def test_data_shards_pipeline_matches_plain(tmp_path):
    """--data-shards over the virtual 8-device mesh byte-reproduces the
    single-device pipeline output (chunk round-robin + associative count
    merge)."""
    from svjedi_tpu.config import DistConfig, PipelineConfig
    from svjedi_tpu.pipeline import run_pipeline

    vcf, fa, fq = _sim_inputs(tmp_path)
    plain = run_pipeline(PipelineConfig(
        vcf=vcf, ref=fa, reads=(str(fq),),
        prefix=str(tmp_path / "plain2"), keep_artifacts=False,
    ))
    sharded = run_pipeline(PipelineConfig(
        vcf=vcf, ref=fa, reads=(str(fq),),
        prefix=str(tmp_path / "shards"), keep_artifacts=False,
        dist=DistConfig(data_shards=4),
    ))
    assert sharded["stats"].counters.get("data_shards") == 4
    a = open(plain["output_vcf"]).read()
    b = open(sharded["output_vcf"]).read()
    assert a == b
