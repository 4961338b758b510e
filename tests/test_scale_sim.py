"""Independent-simulation integration test (BASELINE.md simulated configs).

The golden test-dir gate proves reference parity on 40 bundled SVs; this
test proves the aligner+genotyper generalize: a fresh 300 kb genome, 40
random DEL/INS/INV SVs, and 12x noisy long reads (10% total error) must
genotype near-perfectly. Catches sensitivity regressions the fixed golden
bundle cannot (different SV placements, lengths, genotype mix every time
the seeds change).
"""

import os
import re
import tempfile

import numpy as np

from svjedi_tpu.config import PipelineConfig
from svjedi_tpu.evals.contingency import contingency_report
from svjedi_tpu.io import sim
from svjedi_tpu.pipeline import run_pipeline


def test_simulated_genome_genotyping():
    rng = np.random.default_rng(7)
    s = sim.simulate(seed=1, chrom_lengths={"c1": 300_000}, n_svs=40)
    names, seqs = sim.simulate_reads(rng, s.haplotypes, coverage=12.0)
    with tempfile.TemporaryDirectory() as tmp:
        vcf = os.path.join(tmp, "t.vcf")
        fa = os.path.join(tmp, "r.fa")
        fq = os.path.join(tmp, "reads.fq")
        sim.write_truth_vcf(s, vcf)
        with open(fa, "w") as fh:
            for c, seq in s.chroms.items():
                fh.write(f">{c}\n{seq}\n")
        sim.write_fastq(fq, names, seqs)
        cfg = PipelineConfig(
            vcf=vcf, ref=fa, reads=(fq,),
            prefix=os.path.join(tmp, "out"), keep_artifacts=False,
        )
        res = run_pipeline(cfg)
        report = contingency_report(vcf, res["output_vcf"])

    acc = float(re.search(r"accuracy: ([\d.]+)", report).group(1))
    rate = float(re.search(r"rate: ([\d.]+)", report).group(1))
    assert acc >= 97.5, report
    assert rate >= 95.0, report
