"""Whole-genome decoy competition (specificity) regression test.

minigraph maps reads against the whole graph (svjedi-graph.py:104), so a
read from a paralog loses to its true locus and never reaches the allele
filter. The panel aligner restores that competition via align/decoy.py;
this test builds the adversarial case VERDICT r1 called out: a segmental
duplication of an SV locus where the duplicate copy carries the DEL
junction in the *reference itself*, so every read from the paralog looks
exactly like an alt-allele read at the SV locus.
"""

import os
import tempfile

import numpy as np

from svjedi_tpu.config import AlignConfig, PipelineConfig
from svjedi_tpu.io import sim


def _build_case(tmp):
    """c1 carries a DEL candidate (truth 0/0); c2 is a paralog of the locus
    with the deletion present in the reference copy."""
    rng = np.random.default_rng(42)
    c1 = "".join("ACGT"[i] for i in rng.integers(0, 4, size=60_000))
    pos, length = 30_000, 300
    # Paralog: 3 kb flanks around the locus, middle segment absent — reads
    # from c2 span flankL|flankR exactly like the DEL alt allele.
    c2 = c1[pos - 3_000 : pos] + c1[pos + length : pos + length + 3_000]
    chroms = {"c1": c1, "c2": c2}

    vcf = os.path.join(tmp, "t.vcf")
    with open(vcf, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tTRUTH\n")
        fh.write(
            f"c1\t{pos}\tdel0\tN\t<DEL>\t.\t.\t"
            f"SVTYPE=DEL;END={pos + length};SVLEN=-{length}\tGT\t0/0\n"
        )
    fa = os.path.join(tmp, "r.fa")
    with open(fa, "w") as fh:
        for c, seq in chroms.items():
            fh.write(f">{c}\n{seq}\n")
    # Sample carries no variant: both haplotypes equal the reference.
    names, seqs = sim.simulate_reads(
        rng, (chroms, chroms), coverage=8.0, mean_len=4000, sd_len=1000
    )
    fq = os.path.join(tmp, "reads.fq")
    sim.write_fastq(fq, names, seqs)
    return vcf, fa, fq


def _run(tmp, vcf, fa, fq, decoy: bool):
    from svjedi_tpu.pipeline import run_pipeline

    cfg = PipelineConfig(
        vcf=vcf, ref=fa, reads=(fq,),
        prefix=os.path.join(tmp, f"out_{int(decoy)}"),
        align=AlignConfig(decoy=decoy), keep_artifacts=False,
    )
    return run_pipeline(cfg)["counts"]


def test_paralog_duplication_gives_no_false_alt_support():
    with tempfile.TemporaryDirectory() as tmp:
        vcf, fa, fq = _build_case(tmp)
        counts = _run(tmp, vcf, fa, fq, decoy=True)
        (tag, (ref_n, alt_n)) = next(iter(counts.items()))
        assert "DEL" in tag
        # Paralog reads must be suppressed: alt support vanishes while the
        # genuine ref-junction reads keep counting. (Read sampling is
        # uniform per chromosome, so the tiny paralog is covered ~10x
        # deeper than the SV locus — the adversarial direction.)
        assert ref_n >= 3, counts
        assert alt_n <= 1, counts

        # The scenario must have teeth: without the decoy the paralog
        # manufactures overwhelming false alt support.
        counts_off = _run(tmp, vcf, fa, fq, decoy=False)
        (_, (ref_off, alt_off)) = next(iter(counts_off.items()))
        assert ref_off == ref_n, counts_off  # decoy never eats real support
        assert alt_off >= 10, counts_off
