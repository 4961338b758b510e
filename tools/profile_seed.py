#!/usr/bin/env python3
"""Profile the native seed stage: minimizer scan vs lookup+chain split.

Reproduces the bench.py golden-config seed workload (test-dir reads
replicated REPS times, merged panel+decoy index) and times:
  1. svt_minimizers2 (scan + bitmap filter only)
  2. svt_chain2 (scan + exact lookup + chaining + blocks)
  3. suppress_candidates (decoy competition)
so the difference 2-1 isolates the lookup+chain cost.
"""
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TEST_DIR = Path(os.environ.get("SVJT_TESTDIR", "/root/reference/test-dir"))
REPS = int(os.environ.get("SVJT_BENCH_REPS", "10"))

from svjedi_tpu.align.decoy import build_decoy
from svjedi_tpu.align.index import build_panel_index, merge_indexes
from svjedi_tpu.align.seed import ChainParams, seed_candidates
from svjedi_tpu.config import AlignConfig
from svjedi_tpu.graph.build import build_graph
from svjedi_tpu.graph.cluster import build_panel
from svjedi_tpu.graph.svparse import parse_vcf_svs
from svjedi_tpu.io.fasta import read_fasta
from svjedi_tpu.io.fastq import ReadSet, read_reads
from svjedi_tpu.utils.native import load_native

cfg = AlignConfig()
chroms = read_fasta(TEST_DIR / "reference_genome.fasta")
parsed = parse_vcf_svs(TEST_DIR / "test.vcf", {c: len(s) for c, s in chroms.items()})
graph = build_graph(chroms, parsed)
panel = build_panel(graph, flank=cfg.flank, cluster_gap=cfg.cluster_gap,
                    max_paths_per_cluster=cfg.max_paths_per_cluster)
index = build_panel_index(panel, k=cfg.kmer, w=cfg.window,
                          max_hits_per_minimizer=cfg.max_hits_per_minimizer)
decoy = build_decoy(panel, k=cfg.kmer, w=cfg.window,
                    max_hits_per_minimizer=cfg.max_hits_per_minimizer)
seed_index = merge_indexes(index, decoy.index)

base = read_reads(str(TEST_DIR / "simulated_reads.fastq.gz"))
reads = ReadSet(
    names=[f"{n}/{r}" for r in range(REPS) for n in base.names],
    codes=np.tile(base.codes, REPS),
    offsets=np.concatenate(
        [base.offsets[:-1] + r * base.codes.size for r in range(REPS)]
        + [np.array([base.codes.size * REPS])]
    ),
)
print(f"reads={reads.n_reads} bases={reads.codes.size/1e6:.1f}Mb "
      f"index_hits={len(seed_index.hit_path)} uniq={len(seed_index.uniq_hash)}")

native = load_native()
cp = ChainParams(min_anchors=cfg.min_anchors, max_chains=cfg.max_chains,
                 max_gap=cfg.chain_max_gap, drift_abs=cfg.chain_drift_abs,
                 drift_permille=cfg.chain_drift_permille,
                 block_rows=cfg.block_rows,
                 ext_min_anchors=cfg.chain_ext_min_anchors)

for trial in range(3):
    t0 = time.perf_counter()
    mins = native.minimizers(reads.codes, reads.offsets, seed_index.k,
                             seed_index.w, bitmap=seed_index.hash_bitmap(),
                             bitmap_log2=seed_index.BITMAP_LOG2, n_threads=0)
    t1 = time.perf_counter()
    n_mins = len(mins[0])
    res = native.chain(
        reads.codes, reads.offsets, seed_index.k, seed_index.w,
        bitmap=seed_index.hash_bitmap(), bitmap_log2=seed_index.BITMAP_LOG2,
        uniq_hash=seed_index.uniq_hash, hit_start=seed_index.hit_start,
        hit_path=seed_index.hit_path, hit_pos=seed_index.hit_pos,
        hit_strand=seed_index.hit_strand, params=cp, n_threads=0,
        panel_path_limit=len(index.path_len),
    )
    t2 = time.perf_counter()
    # no-bitmap scan = raw minimizer extraction cost
    mins_nb = native.minimizers(reads.codes, reads.offsets, seed_index.k,
                                seed_index.w, n_threads=0)
    t3 = time.perf_counter()
    print(f"[{trial}] scan+bitmap={t1-t0:.3f}s ({n_mins} kept) "
          f"chain2={t2-t1:.3f}s ({len(res[0])} blocks) "
          f"scan_raw={t3-t2:.3f}s ({len(mins_nb[0])} minimizers)")

# Full python-side seed (what the pipeline calls), incl. suppression
from svjedi_tpu.align.decoy import suppress_candidates

for trial in range(2):
    t0 = time.perf_counter()
    cands = seed_candidates(reads, seed_index, chain_params=cp, threads=0,
                            panel_path_limit=len(index.path_len))
    t1 = time.perf_counter()
    is_panel = cands.path < len(index.path_len)
    dec = cands.take(~is_panel, path_offset=-len(index.path_len))
    pcands = cands.take(is_panel)
    keep = suppress_candidates(reads, pcands, index, decoy, cp, threads=0,
                               dec=dec)
    t2 = time.perf_counter()
    print(f"[full {trial}] seed_candidates={t1-t0:.3f}s "
          f"suppress={t2-t1:.3f}s n_panel={len(pcands)} n_dec={len(dec)}")
