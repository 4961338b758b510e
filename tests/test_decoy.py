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


def test_native_suppression_matches_numpy_reference():
    """The threaded C++ inner loop must equal the numpy pair semantics."""
    import svjedi_tpu.utils.native as native_mod
    from svjedi_tpu.align import decoy as D
    from svjedi_tpu.align.index import build_panel_index, merge_indexes
    from svjedi_tpu.align.seed import ChainParams, seed_candidates
    from svjedi_tpu.config import AlignConfig
    from svjedi_tpu.graph.build import build_graph
    from svjedi_tpu.graph.cluster import build_panel
    from svjedi_tpu.graph.svparse import parse_vcf_svs

    if native_mod.load_native() is None:
        import pytest

        pytest.skip("native library not built")

    from svjedi_tpu.io.fasta import read_fasta
    from svjedi_tpu.io.fastq import read_reads

    cfg = AlignConfig()
    with tempfile.TemporaryDirectory() as tmp:
        vcf, fa, fq = _build_case(tmp)  # paralog: suppression actually fires
        chroms = read_fasta(fa)
        parsed = parse_vcf_svs(vcf, {c: len(x) for c, x in chroms.items()})
        reads = read_reads(fq)
    graph = build_graph(chroms, parsed)
    panel = build_panel(graph, flank=cfg.flank, cluster_gap=cfg.cluster_gap)
    index = build_panel_index(panel, k=cfg.kmer, w=cfg.window)
    decoy = D.build_decoy(panel, k=cfg.kmer, w=cfg.window)
    combo = merge_indexes(index, decoy.index)
    cp = ChainParams()
    cands = seed_candidates(reads, combo, chain_params=cp)
    is_panel = cands.path < len(index.path_len)
    dec = cands.take(~is_panel, path_offset=-len(index.path_len))
    pc = cands.take(is_panel)
    k_native = D.suppress_candidates(reads, pc, index, decoy, cp, dec=dec)
    real = native_mod.load_native
    native_mod.load_native = lambda: None
    try:
        k_numpy = D.suppress_candidates(reads, pc, index, decoy, cp, dec=dec)
    finally:
        native_mod.load_native = real
    assert (~k_native).sum() > 0  # scenario exercises real suppression
    np.testing.assert_array_equal(k_native, k_numpy)


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
