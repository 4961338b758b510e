"""Count-parity hypothesis experiments (round-3, VERDICT #5).

Recounts the SAME winning alignments under candidate read-level selection
rules and diffs raw per-(SV, allele) crossings against the golden VCF:

  baseline   the shipped counting rules
  mapq0      drop winners with mapq == 0 (minigraph drops/zeroes segments
             whose placement is ambiguous; a mapq-0 fragment would be a
             secondary record many pipelines ignore)
  mapqN      drop winners with mapq < N sweep
  xdens      cross-cluster primary selection, score-DENSITY ranked: per
             read, greedily keep fragments by score/span with the
             mask_level 0.5 overlap rule across ALL clusters (PARITY.md's
             earlier cross-cluster test ranked by raw score)
  xdens+m0   xdens then mapq0

Adoption bar (VERDICT): extras < 25 with ZERO new under-counts and the
golden genotype gate intact.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from svjedi_tpu.align.decoy import build_decoy
from svjedi_tpu.align.index import build_panel_index
from svjedi_tpu.align.pipeline import Winners, align_and_count, count_support
from svjedi_tpu.config import AlignConfig, GenotypeConfig
from svjedi_tpu.graph.build import build_graph
from svjedi_tpu.graph.cluster import build_panel
from svjedi_tpu.graph.svparse import parse_vcf_svs
from svjedi_tpu.io.fasta import read_fasta
from svjedi_tpu.io.fastq import read_reads

sys.path.insert(0, str(Path(__file__).resolve().parent))
from debug_parity import golden_raw_counts  # noqa: E402

TD = Path("/root/reference/test-dir")


def subset(w: Winners, mask: np.ndarray) -> Winners:
    out = Winners(*[
        getattr(w, f)[mask]
        for f in ("read", "cluster", "path", "strand", "score",
                  "qs", "qe", "ts", "te")
    ])
    for f in ("matches", "blocklen", "mapq", "anchor_ts", "anchor_te"):
        v = getattr(w, f)
        if v is not None:
            setattr(out, f, v[mask])
    return out


def cross_cluster_density_mask(w: Winners, rlen: np.ndarray) -> np.ndarray:
    """Greedy per-read keep by score density across ALL clusters."""
    n = len(w.read)
    q_lo = np.where(w.strand == 0, w.qs, rlen[w.read] - 1 - w.qe)
    q_hi = np.where(w.strand == 0, w.qe, rlen[w.read] - 1 - w.qs)
    span = np.maximum(1, np.maximum(q_hi - q_lo + 1, w.te - w.ts + 1))
    dens = w.score / span
    keep = np.zeros(n, dtype=bool)
    order = np.lexsort((np.arange(n), -dens, w.read))
    read_s = w.read[order]
    starts = np.flatnonzero(
        np.concatenate([[True], read_s[1:] != read_s[:-1]])
    )
    bounds = np.append(starts, n)
    for gi in range(len(starts)):
        kept = []
        for row in order[bounds[gi]:bounds[gi + 1]]:
            lo, hi = int(q_lo[row]), int(q_hi[row])
            sp = max(1, hi - lo + 1)
            if all(min(hi, kh) - max(lo, kl) + 1 < 0.5 * sp
                   for kl, kh in kept):
                kept.append((lo, hi))
                keep[row] = True
    return keep


def deltas(counts, gold):
    ndiff = extras = unders = 0
    rows = []
    for tag in sorted(gold):
        g = gold[tag]
        o = tuple(counts.get(tag, [0, 0]))
        if g != o:
            ndiff += 1
            for a in (0, 1):
                d = o[a] - g[a]
                if d > 0:
                    extras += d
                else:
                    unders += -d
            rows.append((tag, g, o))
    return ndiff, extras, unders, rows


def main():
    cfg, gcfg = AlignConfig(), GenotypeConfig()
    chroms = read_fasta(TD / "reference_genome.fasta")
    parsed = parse_vcf_svs(TD / "test.vcf",
                           {c: len(s) for c, s in chroms.items()})
    graph = build_graph(chroms, parsed)
    panel = build_panel(graph, flank=cfg.flank, cluster_gap=cfg.cluster_gap,
                        max_paths_per_cluster=cfg.max_paths_per_cluster)
    index = build_panel_index(panel, k=cfg.kmer, w=cfg.window,
                              max_hits_per_minimizer=cfg.max_hits_per_minimizer)
    decoy = build_decoy(panel, k=cfg.kmer, w=cfg.window,
                        max_hits_per_minimizer=cfg.max_hits_per_minimizer)
    reads = read_reads(str(TD / "simulated_reads.fastq.gz"))
    counts0, _, winners = align_and_count(
        reads, panel, index, cfg, gcfg, collect_audit=False, decoy=decoy
    )
    gold = golden_raw_counts()

    def report(name, w):
        c, _ = count_support(panel, w, reads, gcfg.d_over, False)
        nd, ex, un, rows = deltas(c, gold)
        print(f"{name:12s} ndiff={nd:3d} extras={ex:3d} unders={un:3d}")
        return nd, ex, un, rows

    print(f"winners={len(winners.read)} mapq0={int((winners.mapq == 0).sum())}")
    report("baseline", winners)
    for thr in (1, 5, 10, 20):
        report(f"mapq<{thr}", subset(winners, winners.mapq >= thr))
    keep = cross_cluster_density_mask(winners, reads.lengths)
    report("xdens", subset(winners, keep))
    report("xdens+m0", subset(winners, keep & (winners.mapq >= 1)))


if __name__ == "__main__":
    main()
