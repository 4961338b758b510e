"""Genome-wide decoy competition (specificity).

minigraph maps every read against the WHOLE graph (svjedi-graph.py:104), so
a read from a repeat or paralog loses to its true locus and never reaches
the allele filter as a spurious panel hit. The panel aligner sees only
breakpoint neighborhoods, so repetitive reads can manufacture false allele
support. This module restores whole-genome competition at chain level, the
same stage where minigraph's primary/secondary selection happens (chain
score, before base alignment):

1. a minimizer index over the reference chromosomes (one "path" per chrom)
   is built once;
2. every read chunk is seeded+chained against it with the same native
   chainer as the panel;
3. a panel chain is SUPPRESSED (all its blocks dropped before DP) when a
   decoy chain of the same read (a) covers >= ``overlap_frac`` of the panel
   chain's read interval, (b) lies genomically OUTSIDE the panel cluster's
   span (a same-locus decoy is the ref allele, not a competitor), and
   (c) carries strictly more anchors.

Suppression is pre-DP, so the specificity fix also removes junk DP volume.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from ..graph.cluster import Panel
from ..io.fastq import ReadSet, encode_ascii
from .index import PanelIndex
from .minimizer import extract_minimizers
from .seed import Candidates, ChainParams, seed_candidates


@dataclass
class Decoy:
    """Decoy index + panel-cluster genomic spans + knobs."""

    index: PanelIndex  # over chromosomes (path id = chrom order index)
    chrom_of_path: List[str]
    #: cluster id -> {chrom: (lo, hi)} genomic span of its panel paths
    cluster_spans: List[Dict[str, Tuple[int, int]]]
    overlap_frac: float = 0.5
    margin: int = 2000


def build_decoy(
    panel: Panel, k: int, w: int, max_hits_per_minimizer: int = 64
) -> Decoy:
    """Build the whole-genome decoy index + per-cluster genomic spans."""
    graph = panel.graph
    hashes, paths, positions, strands = [], [], [], []
    chrom_of_path = list(graph.chrom_order)
    lens = []
    for pid, chrom in enumerate(chrom_of_path):
        codes = encode_ascii(graph.chrom_seq[chrom])
        lens.append(len(codes))
        mins = extract_minimizers(codes, k, w)
        hashes.append(mins.hash)
        positions.append(mins.pos)
        strands.append(mins.strand)
        paths.append(np.full(len(mins.pos), pid, dtype=np.int32))

    all_hash = np.concatenate(hashes) if hashes else np.zeros(0, np.uint32)
    all_path = np.concatenate(paths) if paths else np.zeros(0, np.int32)
    all_pos = np.concatenate(positions) if positions else np.zeros(0, np.int32)
    all_strand = np.concatenate(strands) if strands else np.zeros(0, np.int8)
    order = np.argsort(all_hash, kind="stable")
    all_hash, all_path = all_hash[order], all_path[order]
    all_pos, all_strand = all_pos[order], all_strand[order]
    uniq, start = np.unique(all_hash, return_index=True)
    counts = np.diff(np.append(start, len(all_hash)))
    keep = counts <= max_hits_per_minimizer
    if keep.any():
        sel = np.concatenate(
            [np.arange(s, s + c) for s, c, k_ in zip(start, counts, keep) if k_]
        )
    else:
        sel = np.zeros(0, np.int64)
    uniq = uniq[keep]
    hit_start = np.zeros(len(uniq) + 1, dtype=np.int64)
    np.cumsum(counts[keep], out=hit_start[1:])
    n_paths = len(chrom_of_path)
    index = PanelIndex(
        k=k,
        w=w,
        uniq_hash=uniq,
        hit_start=hit_start,
        hit_path=all_path[sel],
        hit_pos=all_pos[sel],
        hit_strand=all_strand[sel],
        path_cluster=np.arange(n_paths, dtype=np.int32),
        path_len=np.array(lens, dtype=np.int32),
        path_first_j=np.zeros(n_paths, dtype=np.int32),
        path_last_j=np.zeros(n_paths, dtype=np.int32),
    )

    spans: List[Dict[str, Tuple[int, int]]] = []
    for cl in panel.clusters:
        span: Dict[str, Tuple[int, int]] = {}
        for pi in cl.paths:
            for node_idx, _ in panel.paths[pi].states:
                node = graph.nodes[node_idx]
                lo, hi = int(node.start0), int(node.end0)
                if node.chrom in span:
                    a, b = span[node.chrom]
                    span[node.chrom] = (min(a, lo), max(b, hi))
                else:
                    span[node.chrom] = (lo, hi)
        spans.append(span)
    return Decoy(index=index, chrom_of_path=chrom_of_path, cluster_spans=spans)


def _chain_table(cands: Candidates, rlen: np.ndarray):
    """Aggregate block rows into per-chain rows.

    Returns (chain_ids, read, path, support, q_lo_f, q_hi_f, t_lo, t_hi)
    with the read interval normalized to FORWARD read coordinates."""
    if len(cands) == 0:
        z = np.zeros(0, np.int64)
        return (z,) * 8
    uniq, first = np.unique(cands.chain, return_index=True)
    # blocks of one chain are contiguous; last row index per chain:
    order = np.argsort(cands.chain, kind="stable")
    last = np.zeros(len(uniq), dtype=np.int64)
    np.maximum.at(
        last,
        np.searchsorted(uniq, cands.chain[order]),
        order,
    )
    read = cands.read[first].astype(np.int64)
    path = cands.path[first].astype(np.int64)
    strand = cands.strand[first].astype(np.int64)
    support = cands.n_anchors[first].astype(np.int64)
    q_lo = cands.q_lo[first].astype(np.int64)
    q_hi = cands.q_hi[last].astype(np.int64)
    rl = rlen[read]
    q_lo_f = np.where(strand == 0, q_lo, rl - q_hi)
    q_hi_f = np.where(strand == 0, q_hi, rl - q_lo)
    t_lo = cands.d0[first].astype(np.int64) + q_lo
    t_hi = cands.d0[last].astype(np.int64) + q_hi
    return uniq, read, path, support, q_lo_f, q_hi_f, t_lo, t_hi


def suppress_candidates(
    reads: ReadSet,
    cands: Candidates,
    index: PanelIndex,
    decoy: Decoy,
    chain_params: ChainParams,
    threads: int = 0,
) -> np.ndarray:
    """Return a keep-mask over ``cands`` rows (False = suppressed chain)."""
    n = len(cands)
    if n == 0:
        return np.ones(0, dtype=bool)
    dec = seed_candidates(
        reads, decoy.index, chain_params=chain_params, threads=threads
    )
    (d_chain, d_read, d_path, d_sup, d_qlo, d_qhi, d_tlo, d_thi) = (
        _chain_table(dec, reads.lengths)
    )
    (p_chain, p_read, p_path, p_sup, p_qlo, p_qhi, _, _) = _chain_table(
        cands, reads.lengths
    )
    p_cluster = index.path_cluster[p_path]

    # group decoy chains by read
    d_order = np.argsort(d_read, kind="stable")
    d_read_s = d_read[d_order]

    suppressed = set()
    for ci in range(len(p_chain)):
        r = p_read[ci]
        lo = np.searchsorted(d_read_s, r, "left")
        hi = np.searchsorted(d_read_s, r, "right")
        if lo == hi:
            continue
        plen = p_qhi[ci] - p_qlo[ci]
        if plen <= 0:
            continue
        span = decoy.cluster_spans[int(p_cluster[ci])]
        for di in d_order[lo:hi]:
            ov = min(p_qhi[ci], d_qhi[di]) - max(p_qlo[ci], d_qlo[di])
            if ov < decoy.overlap_frac * plen:
                continue
            if d_sup[di] <= p_sup[ci]:
                continue
            chrom = decoy.chrom_of_path[int(d_path[di])]
            ex = span.get(chrom)
            if ex is not None and (
                d_thi[di] >= ex[0] - decoy.margin
                and d_tlo[di] <= ex[1] + decoy.margin
            ):
                continue  # same-locus decoy = the ref allele, not junk
            suppressed.add(int(p_chain[ci]))
            break
    if not suppressed:
        return np.ones(n, dtype=bool)
    sup_arr = np.fromiter(suppressed, dtype=np.int64, count=len(suppressed))
    return ~np.isin(cands.chain, sup_arr)
