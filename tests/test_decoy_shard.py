"""Decoy-index sharding (dist/decoy_shard.py): byte equality vs unsharded.

The Gb-genome gate 2/2: each graph-axis shard holds a genomic range of the
decoy hit table; claimed chains union to the exact unsharded chain set and
margins merge by elementwise max. These tests pin the equality the module
docstring argues (tests run on CPU; the reduction itself is plain numpy —
the pod deployment runs the same max over the graph axis).
"""

import numpy as np
import pytest

from conftest import require_reference, TEST_DATA

from svjedi_tpu.align.decoy import build_decoy, suppress_candidates
from svjedi_tpu.align.index import build_panel_index, merge_indexes
from svjedi_tpu.align.seed import ChainParams, seed_candidates
from svjedi_tpu.config import AlignConfig
from svjedi_tpu.dist.decoy_shard import (
    build_decoy_shard,
    split_decoy,
    suppress_candidates_sharded,
)
from svjedi_tpu.graph.build import build_graph
from svjedi_tpu.graph.cluster import build_panel
from svjedi_tpu.graph.svparse import parse_vcf_svs
from svjedi_tpu.io.fasta import read_fasta
from svjedi_tpu.io.fastq import read_reads

MARGIN = 32768  # > max test-dir read span + chaining interaction radius


@pytest.fixture(scope="module")
def setup():
    require_reference()
    cfg = AlignConfig()
    chroms = read_fasta(TEST_DATA / "reference_genome.fasta")
    parsed = parse_vcf_svs(
        TEST_DATA / "test.vcf", {c: len(s) for c, s in chroms.items()}
    )
    graph = build_graph(chroms, parsed)
    panel = build_panel(
        graph, flank=cfg.flank, cluster_gap=cfg.cluster_gap,
        max_paths_per_cluster=cfg.max_paths_per_cluster,
    )
    index = build_panel_index(
        panel, k=cfg.kmer, w=cfg.window,
        max_hits_per_minimizer=cfg.max_hits_per_minimizer,
    )
    decoy = build_decoy(
        panel, k=cfg.kmer, w=cfg.window,
        max_hits_per_minimizer=cfg.max_hits_per_minimizer,
    )
    reads = read_reads(str(TEST_DATA / "simulated_reads.fastq.gz"))
    cp = ChainParams(
        min_anchors=cfg.min_anchors, max_chains=cfg.max_chains,
        max_gap=cfg.chain_max_gap, drift_abs=cfg.chain_drift_abs,
        drift_permille=cfg.chain_drift_permille, block_rows=cfg.block_rows,
        ext_min_anchors=cfg.chain_ext_min_anchors,
    )
    merged = merge_indexes(index, decoy.index)
    n_panel = len(index.path_len)
    cands_all = seed_candidates(
        reads, merged, chain_params=cp, panel_path_limit=n_panel
    )
    is_panel = cands_all.path < n_panel
    cands = cands_all.take(is_panel)
    return dict(panel=panel, index=index, decoy=decoy, reads=reads, cp=cp,
                cands=cands)


def test_split_covers_every_hit_once_in_owned_range(setup):
    decoy = setup["decoy"]
    shards = split_decoy(decoy, 3, margin=MARGIN)
    # Every original hit appears in >= 1 shard; hits in a shard's OWNED
    # range appear exactly once across owned ranges.
    total_owned = 0
    for sh in shards:
        idx = sh.decoy.index
        g = sh.chrom_offset[idx.hit_path] + idx.hit_pos.astype(np.int64)
        total_owned += int(((g >= sh.own_lo) & (g < sh.own_hi)).sum())
    assert total_owned == len(decoy.index.hit_path)
    # Per-shard hit residency really is a fraction of the full table.
    full_bytes = sum(
        getattr(decoy.index, f).nbytes
        for f in ("uniq_hash", "hit_start", "hit_path", "hit_pos",
                  "hit_strand")
    )
    for sh in shards:
        assert sh.hit_bytes() < full_bytes


def _rows(dc):
    return [
        (
            int(dc.read[i]), int(dc.path[i]), int(dc.strand[i]),
            int(dc.d0[i]), int(dc.q_lo[i]), int(dc.q_hi[i]),
            int(dc.n_anchors[i]), int(dc.a_lo[i]), int(dc.a_hi[i]),
            int(dc.head_diag[i]),
        )
        for i in range(len(dc))
    ]


def test_claimed_union_plus_global_cap_equals_unsharded(setup):
    """union(uncapped per-shard chains) + global top-max_chains == the
    unsharded capped seeding, row for row (the per-shard cap alone would
    resurrect chains the global truncation dropped — that failure mode is
    exactly what apply_global_chain_cap exists for)."""
    from svjedi_tpu.dist.decoy_shard import (
        apply_global_chain_cap,
        union_decoy_chains,
    )

    decoy, reads, cp = setup["decoy"], setup["reads"], setup["cp"]
    dec_full = seed_candidates(reads, decoy.index, chain_params=cp)
    shards = split_decoy(decoy, 3, margin=MARGIN)
    union = union_decoy_chains(reads, shards, cp)
    capped = apply_global_chain_cap(
        union, len(decoy.index.path_len), cp.max_chains
    )
    # Same chains, same blocks; chain ids are arbitrary, row order within a
    # read may differ (kept-rank vs group order) — compare as multisets.
    assert sorted(_rows(capped)) == sorted(_rows(dec_full))


@pytest.mark.parametrize("n_shards", [2, 3, 5])
def test_sharded_suppression_byte_equal(setup, n_shards):
    reads, cands, cp = setup["reads"], setup["cands"], setup["cp"]
    index, decoy = setup["index"], setup["decoy"]
    keep_u, other_u, same_u = suppress_candidates(
        reads, cands, index, decoy, cp, return_margins=True
    )
    shards = split_decoy(decoy, n_shards, margin=MARGIN)
    keep_s, other_s, same_s = suppress_candidates_sharded(
        reads, cands, index, shards, cp
    )
    assert np.array_equal(other_s, other_u)
    assert np.array_equal(same_s, same_u)
    assert np.array_equal(keep_s, keep_u)


def test_build_decoy_shard_matches_split(setup):
    """Direct bounded-memory shard construction == split of the full index."""
    panel, decoy = setup["panel"], setup["decoy"]
    cfg = AlignConfig()
    split = split_decoy(decoy, 2, margin=MARGIN)
    for s in range(2):
        built = build_decoy_shard(
            panel, 2, s, k=cfg.kmer, w=cfg.window,
            max_hits_per_minimizer=cfg.max_hits_per_minimizer,
            margin=MARGIN,
        )
        a, b = built.decoy.index, split[s].decoy.index
        assert np.array_equal(a.uniq_hash, b.uniq_hash)
        assert np.array_equal(a.hit_start, b.hit_start)
        # Hit payload equality up to within-hash ordering: sort both.
        ka = np.lexsort((a.hit_strand, a.hit_pos, a.hit_path,
                         np.repeat(np.arange(len(a.uniq_hash)),
                                   np.diff(a.hit_start))))
        kb = np.lexsort((b.hit_strand, b.hit_pos, b.hit_path,
                         np.repeat(np.arange(len(b.uniq_hash)),
                                   np.diff(b.hit_start))))
        assert np.array_equal(a.hit_path[ka], b.hit_path[kb])
        assert np.array_equal(a.hit_pos[ka], b.hit_pos[kb])
        assert np.array_equal(a.hit_strand[ka], b.hit_strand[kb])
        assert (built.own_lo, built.own_hi) == (
            split[s].own_lo, split[s].own_hi
        )
