"""Stage-artifact resume (SURVEY §5.4): a second run with ``resume`` skips
the aligner and byte-reproduces the genotyped VCF from the audit table."""

import numpy as np

from svjedi_tpu.config import PipelineConfig
from svjedi_tpu.io import sim
from svjedi_tpu.pipeline import run_pipeline


def test_resume_skips_align_and_reproduces_vcf(tmp_path, monkeypatch):
    rng = np.random.default_rng(5)
    simulation = sim.simulate(
        seed=5,
        chrom_lengths={"chrA": 40000},
        n_svs=6,
        sv_types=("DEL", "INS", "INV"),
    )
    vcf = tmp_path / "truth.vcf"
    fasta = tmp_path / "ref.fasta"
    fastq = tmp_path / "reads.fastq"
    sim.write_truth_vcf(simulation, vcf)
    from svjedi_tpu.io.fasta import write_fasta

    write_fasta(fasta, simulation.chroms)
    names, seqs = sim.simulate_reads(
        rng, simulation.haplotypes, coverage=12.0, mean_len=5000, sd_len=1500
    )
    sim.write_fastq(fastq, names, seqs)

    cfg = PipelineConfig(
        vcf=vcf, ref=fasta, reads=(str(fastq),),
        prefix=str(tmp_path / "out"),
    )
    result = run_pipeline(cfg)
    first_vcf = open(result["output_vcf"]).read()

    # Second run with resume: the aligner must not be entered at all.
    def _boom(*a, **kw):  # pragma: no cover - failure path
        raise AssertionError("align_and_count called despite resume")

    import svjedi_tpu.pipeline as pl

    monkeypatch.setattr(pl, "align_and_count", _boom)
    cfg2 = PipelineConfig(
        vcf=vcf, ref=fasta, reads=(str(fastq),),
        prefix=str(tmp_path / "out"), resume=True,
    )
    result2 = run_pipeline(cfg2)
    assert result2["stats"].counters.get("resumed_from")
    assert open(result2["output_vcf"]).read() == first_vcf


def test_cli_exposes_resume():
    """--resume must parse and reach PipelineConfig (not just exist as a
    string in the source — the round-2 review flagged the grep version)."""
    from svjedi_tpu.cli import build_parser

    args = build_parser().parse_args([
        "run", "-v", "a.vcf", "-r", "r.fa", "-q", "x.fq", "-p", "out",
        "--resume",
    ])
    assert args.resume is True
    args2 = build_parser().parse_args([
        "run", "-v", "a.vcf", "-r", "r.fa", "-q", "x.fq", "-p", "out",
    ])
    assert args2.resume is False
