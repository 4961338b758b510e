"""GAF interop round trip: our GAF through the reference filter semantics.

The pipeline can emit minigraph-style GAF (--gaf). Feeding that GAF back
through the reference's filter-alignments semantics (genotype/filter_gaf,
the `filter` CLI command) and genotyping must reproduce the genotypes of
the native counting path — the interop contract that lets a reference user
inspect or re-process our alignments with their own tooling. (Counts may
differ slightly: per-cluster local records overlap on shared flanks, see
align/gaf_out.py; genotype equality is the contract.)
"""

import numpy as np

from svjedi_tpu.config import PipelineConfig
from svjedi_tpu.genotype.filter_gaf import (
    counts_from_informative, filter_gaf_files,
)
from svjedi_tpu.genotype.vcf_writer import write_genotyped_vcf
from svjedi_tpu.io import sim
from svjedi_tpu.pipeline import run_pipeline


def _genotypes(vcf_path):
    out = {}
    for line in open(vcf_path):
        if line.startswith("#"):
            continue
        f = line.rstrip("\n").split("\t")
        out[(f[0], f[1], f[4])] = f[9].split(":")[0]
    return out


def test_gaf_refilter_reproduces_genotypes(tmp_path):
    rng = np.random.default_rng(12)
    s = sim.simulate(seed=4, chrom_lengths={"c1": 80_000}, n_svs=10)
    names, seqs = sim.simulate_reads(
        rng, s.haplotypes, coverage=8.0, mean_len=3000, sd_len=600
    )
    vcf = tmp_path / "t.vcf"
    fa = tmp_path / "r.fa"
    fq = tmp_path / "reads.fq"
    sim.write_truth_vcf(s, vcf)
    with open(fa, "w") as fh:
        for c, seq in s.chroms.items():
            fh.write(f">{c}\n{seq}\n")
    sim.write_fastq(fq, names, seqs)

    prefix = str(tmp_path / "out")
    res = run_pipeline(PipelineConfig(
        vcf=vcf, ref=fa, reads=(str(fq),), prefix=prefix,
        keep_artifacts=True, write_gaf=True,
    ))
    native_gt = _genotypes(res["output_vcf"])

    informative = filter_gaf_files(
        f"{prefix}.gaf", f"{prefix}.gfa", f"{prefix}_svs_edges.json", 100
    )
    counts = counts_from_informative(informative)
    refiltered_vcf = tmp_path / "refiltered.vcf"
    write_genotyped_vcf(vcf, refiltered_vcf, counts)
    refiltered_gt = _genotypes(refiltered_vcf)

    assert sum(1 for g in native_gt.values() if g != "./.") >= 5
    assert refiltered_gt == native_gt
