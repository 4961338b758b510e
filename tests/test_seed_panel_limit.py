"""Merged-index seeding with the panel-path limit (fastio.cpp svt_chain2).

The limit drops reads with no panel anchor before chaining. Two contracts:
native == numpy under the limit, and the PANEL rows of limited seeding are
identical to the panel rows of full seeding (only never-countable decoy
rows may disappear).
"""

import numpy as np

import svjedi_tpu.utils.native as native_mod
from svjedi_tpu.align.decoy import build_decoy
from svjedi_tpu.align.index import build_panel_index, merge_indexes
from svjedi_tpu.align.seed import ChainParams, seed_candidates
from svjedi_tpu.config import AlignConfig
from svjedi_tpu.graph.build import build_graph
from svjedi_tpu.graph.cluster import build_panel
from svjedi_tpu.graph.svparse import parse_vcf_svs
from svjedi_tpu.io import sim
from svjedi_tpu.io.fastq import ReadSet, encode_ascii

FIELDS = ("read", "path", "strand", "d0", "n_anchors",
          "q_lo", "q_hi", "a_lo", "a_hi")


def _workload():
    import os
    import tempfile

    cfg = AlignConfig()
    rng = np.random.default_rng(15)
    s = sim.simulate(seed=16, chrom_lengths={"c1": 120_000}, n_svs=6)
    names, seqs = sim.simulate_reads(
        rng, s.haplotypes, coverage=5.0, mean_len=3000, sd_len=800
    )
    with tempfile.TemporaryDirectory() as tmp:
        vcf = os.path.join(tmp, "t.vcf")
        sim.write_truth_vcf(s, vcf)
        parsed = parse_vcf_svs(vcf, {c: len(x) for c, x in s.chroms.items()})
    graph = build_graph(s.chroms, parsed)
    panel = build_panel(graph, flank=cfg.flank, cluster_gap=cfg.cluster_gap)
    index = build_panel_index(panel, k=cfg.kmer, w=cfg.window)
    decoy = build_decoy(panel, k=cfg.kmer, w=cfg.window)
    combo = merge_indexes(index, decoy.index)
    codes = np.concatenate([encode_ascii(x) for x in seqs])
    offsets = np.concatenate(
        [[0], np.cumsum([len(x) for x in seqs])]
    ).astype(np.int64)
    reads = ReadSet(names=names, codes=codes, offsets=offsets)
    return reads, combo, len(index.path_len)


def test_panel_limit_native_matches_numpy_and_keeps_panel_rows():
    reads, combo, n_panel = _workload()
    cp = ChainParams()
    limited = seed_candidates(
        reads, combo, chain_params=cp, panel_path_limit=n_panel
    )
    full = seed_candidates(reads, combo, chain_params=cp)
    # Sparse-panel genome: the limit must actually drop decoy-only reads.
    assert len(limited) < len(full)

    real = native_mod.load_native
    native_mod.load_native = lambda: None
    try:
        limited_np = seed_candidates(
            reads, combo, chain_params=cp, panel_path_limit=n_panel
        )
    finally:
        native_mod.load_native = real
    for f in FIELDS:
        np.testing.assert_array_equal(
            getattr(limited, f), getattr(limited_np, f), err_msg=f
        )

    # Panel rows are untouched by the limit.
    pf = full.take(full.path < n_panel)
    pl = limited.take(limited.path < n_panel)
    for f in FIELDS:
        np.testing.assert_array_equal(
            getattr(pf, f), getattr(pl, f), err_msg=f
        )
