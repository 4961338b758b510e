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


def test_audit_lines_have_real_matches_and_identity():
    rng = np.random.default_rng(9)
    s = sim.simulate(seed=4, chrom_lengths={"c1": 80_000}, n_svs=8,
                     sv_types=("DEL", "INS", "INV"))
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
    counts, audit, winners = align_and_count(
        reads, panel, index, cfg, GenotypeConfig(), collect_audit=True
    )
    assert counts, "no support counted"
    assert winners.matches is not None

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
