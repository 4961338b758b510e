"""Audit-GAF fidelity: real matches / block length / identity per counted
alignment (reference: filter-alignments.py:166,193-196 stores the GAF line
and consumes cols 10-12 + ``id:f:``)."""

import numpy as np

from svjedi_tpu.align.extend import (
    DPParams, band_dp_batch, band_dp_stats_batch,
)
from svjedi_tpu.align.index import build_panel_index
from svjedi_tpu.align.pipeline import align_and_count
from svjedi_tpu.config import AlignConfig, GenotypeConfig
from svjedi_tpu.graph.build import build_graph
from svjedi_tpu.graph.cluster import build_panel
from svjedi_tpu.graph.svparse import parse_vcf_svs
from svjedi_tpu.io import sim
from svjedi_tpu.io.fastq import ReadSet


def test_stats_dp_counts_matches_exactly():
    rng = np.random.default_rng(3)
    B = 128
    t = rng.integers(0, 4, size=600).astype(np.int8)
    # Read = target slice with 5 substitutions: matches = len - 5.
    q = t[100:400].copy()
    sub_pos = rng.choice(len(q), size=5, replace=False)
    q[sub_pos] = (q[sub_pos] + 1) % 4
    M = 512
    qb = np.full((1, M), 4, np.int8)
    tb = np.full((1, M + B), 4, np.int8)
    qb[0, : len(q)] = q
    # Band centered: t window starts at 100 - B//2.
    lo = 100 - B // 2
    tb[0, : min(M + B, len(t) - lo)] = t[lo : lo + M + B]
    out = band_dp_stats_batch(qb, tb, B, DPParams())
    ref = band_dp_batch(qb, tb, B, DPParams())
    assert int(out["score"][0]) == int(ref["score"][0])
    assert int(out["matches"][0]) == len(q) - 5
    assert int(out["n_diag"][0]) == len(q)


def test_compute_mapq_margins():
    """mapq is a real margin model, not a constant (round-2 verdict #4)."""
    from svjedi_tpu.align.pipeline import compute_mapq

    score = np.array([100, 100, 100, 100, 100, 100])
    s2 = np.array([0, 50, 100, 0, 0, 0])
    support = np.array([20, 20, 20, 5, 20, 20])
    dec_other = np.array([0, 0, 0, 0, 10, 20])
    dec_same = np.array([0, 0, 0, 0, 20, 20])
    mq = compute_mapq(score, s2, support, dec_other, dec_same)
    # Unique, well-supported, unchallenged -> max quality.
    assert mq[0] == 60
    # Same-path challenger at half the score halves the confidence.
    assert mq[1] == 30
    # Tied challenger -> 0.
    assert mq[2] == 0
    # Thin anchor support caps quality (min(1, 5/10)).
    assert mq[3] == 30
    # Decoy margin: elsewhere evidence at half the at-locus evidence.
    assert mq[4] == 30
    # Decoy tie -> 0 (a suppressed chain would already be gone; a tie
    # that survives is maximally ambiguous).
    assert mq[5] == 0
    # Monotone in the same-path margin.
    sweep = compute_mapq(
        np.full(5, 100), np.array([0, 20, 40, 60, 80]),
        np.full(5, 20), np.zeros(5), np.zeros(5),
    )
    assert (np.diff(sweep) < 0).all()


def test_audit_lines_have_real_matches_and_identity():
    rng = np.random.default_rng(9)
    s = sim.simulate(seed=4, chrom_lengths={"c1": 80_000}, n_svs=8,
                     sv_types=("DEL", "INS", "INV"))
    # Paralog of one SV locus: reads from c2 explain an SV neighborhood's
    # ref allele equally well from elsewhere in the genome — the decoy
    # margin must push those winners' mapq below 60 (variability check).
    sv = s.svs[0]
    lo = max(0, sv.pos - 3000)
    src = s.chroms[sv.chrom][lo : sv.pos + 3000]
    # ~7% diverged copy: shares enough minimizers to compete but loses
    # some — intermediate dec_other/denom ratios, hence mid-range mapq.
    bases = np.frombuffer(src.encode(), dtype=np.uint8).copy()
    mut = rng.random(len(bases)) < 0.07
    bases[mut] = np.frombuffer(b"ACGT", dtype=np.uint8)[
        rng.integers(0, 4, int(mut.sum()))
    ]
    paralog = bases.tobytes().decode()
    s.chroms["c2"] = paralog
    for hap in s.haplotypes:
        hap["c2"] = paralog
    names, seqs = sim.simulate_reads(rng, s.haplotypes, coverage=8.0)
    lut = np.full(256, 4, np.int8)
    for b, v in zip(b"ACGT", range(4)):
        lut[b] = v
    codes = lut[np.frombuffer("".join(seqs).encode(), dtype=np.uint8)]
    offsets = np.concatenate(
        [[0], np.cumsum([len(x) for x in seqs])]
    ).astype(np.int64)
    reads = ReadSet(names=names, codes=codes, offsets=offsets)

    import os
    import tempfile

    cfg = AlignConfig()
    with tempfile.TemporaryDirectory() as tmp:
        vcf = os.path.join(tmp, "t.vcf")
        sim.write_truth_vcf(s, vcf)
        parsed = parse_vcf_svs(vcf, {c: len(x) for c, x in s.chroms.items()})
    graph = build_graph(s.chroms, parsed)
    panel = build_panel(graph, flank=cfg.flank, cluster_gap=cfg.cluster_gap)
    index = build_panel_index(panel, k=cfg.kmer, w=cfg.window)
    from svjedi_tpu.align.decoy import build_decoy

    decoy = build_decoy(panel, k=cfg.kmer, w=cfg.window)
    counts, audit, winners = align_and_count(
        reads, panel, index, cfg, GenotypeConfig(), collect_audit=True,
        decoy=decoy,
    )
    assert counts, "no support counted"
    assert winners.matches is not None
    # mapq is computed per winner from real margins — a constant would
    # regress to the round-2 placeholder.
    assert winners.mapq is not None
    assert len(np.unique(winners.mapq)) >= 3, np.unique(winners.mapq)
    assert 0 <= winners.mapq.min() and winners.mapq.max() == 60

    n_lines = 0
    for tag, (ref_lines, alt_lines) in audit.items():
        for line in ref_lines + alt_lines:
            cols = line.rstrip("\t").split("\t")
            assert len(cols) >= 13, cols
            qlen, qs, qe = int(cols[1]), int(cols[2]), int(cols[3])
            matches, blocklen = int(cols[9]), int(cols[10])
            mapq = int(cols[11])
            # Matches is a real count: bounded by the block and the span.
            assert 0 < matches <= blocklen
            assert matches <= qe - qs
            assert 0 <= mapq <= 60
            assert cols[12].startswith("id:f:")
            ident = float(cols[12][5:])
            assert abs(ident - matches / blocklen) < 1e-5
            # Sim reads here have ~1% error: identity must be high but
            # this asserts it is a *measured* value, not a placeholder.
            assert 0.5 < ident <= 1.0
            n_lines += 1
    assert n_lines > 0
