"""Seeding: read minimizers → panel anchors → per-(read,path,strand) candidates.

A candidate is a (read, panel path, strand) pair with an estimated diagonal
``d0`` (path position minus read position) derived from the modal diagonal
bin of its anchors — the "rough chaining" that positions the banded DP. All
steps are flat array ops over every read at once.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from ..io.fastq import ReadSet
from ..utils.native import load_native
from .index import PanelIndex
from .minimizer import extract_minimizers_flat


@dataclass
class Candidates:
    """Flat candidate arrays (one row per (read, path, strand) candidate)."""

    read: np.ndarray  # int32
    path: np.ndarray  # int32
    strand: np.ndarray  # int8 (0: read fwd vs path; 1: revcomp read vs path)
    d0: np.ndarray  # int32 modal diagonal (path_pos - read_pos, strand-adjusted)
    n_anchors: np.ndarray  # int32 anchors in the modal bin neighborhood

    def __len__(self) -> int:
        return len(self.read)


def _expand_ranges(start: np.ndarray, end: np.ndarray):
    """Concatenate [start_i, end_i) ranges into one index array + repeats."""
    counts = (end - start).astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64), counts
    # within-group offsets: arange(total) - prefix repeated
    prefix = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=prefix[1:])
    flat = np.arange(total, dtype=np.int64) - np.repeat(prefix, counts)
    return np.repeat(start.astype(np.int64), counts) + flat, counts


def seed_candidates(
    reads: ReadSet,
    index: PanelIndex,
    min_anchors: int = 2,
    diag_bin: int = 128,
    threads: int = 0,
) -> Candidates:
    """Compute alignment candidates for every read against the panel.

    ``threads`` bounds the native scan's thread count (0 = all hardware
    threads); it is the working equivalent of the reference's ``-t``.
    """
    rlen = reads.lengths
    native = load_native()
    if native is not None and hasattr(native._lib, "svt_seed"):
        res = native.seed(
            reads.codes, reads.offsets, index.k, index.w,
            bitmap=index.hash_bitmap(), bitmap_log2=index.BITMAP_LOG2,
            uniq_hash=index.uniq_hash, hit_start=index.hit_start,
            hit_path=index.hit_path, hit_pos=index.hit_pos,
            hit_strand=index.hit_strand,
            diag_bin=diag_bin, min_anchors=min_anchors,
            n_threads=threads,
        )
        if res is not None:
            read, path, strand, d0, support = res
            return Candidates(
                read=read, path=path, strand=strand, d0=d0,
                n_anchors=support,
            )
    native_result = (
        native.minimizers(
            reads.codes, reads.offsets, index.k, index.w,
            bitmap=index.hash_bitmap(), bitmap_log2=index.BITMAP_LOG2,
            n_threads=threads,
        )
        if native is not None
        else None
    )
    if native_result is not None:
        q_read, q_pos, q_hash, q_strand = native_result
    else:
        flat = extract_minimizers_flat(
            reads.codes, reads.offsets, index.k, index.w
        )
        q_read, q_pos = flat.read_id, flat.pos
        q_hash, q_strand = flat.hash, flat.strand
    if len(q_pos) == 0:
        z = np.zeros(0, np.int32)
        return Candidates(z, z, z.astype(np.int8), z, z)

    start, end = index.lookup(q_hash)
    hit_idx, counts = _expand_ranges(start, end)

    a_read = np.repeat(q_read, counts)
    a_rpos = np.repeat(q_pos, counts)
    a_rstrand = np.repeat(q_strand, counts)
    a_path = index.hit_path[hit_idx]
    a_tpos = index.hit_pos[hit_idx]
    a_tstrand = index.hit_strand[hit_idx]

    strand = (a_rstrand ^ a_tstrand).astype(np.int8)
    # Effective read coordinate: for reverse-strand candidates we align the
    # reverse-complemented read, where this k-mer starts at rlen - k - pos.
    rlen_a = rlen[a_read]
    rpos_eff = np.where(strand == 0, a_rpos, rlen_a - index.k - a_rpos)
    diag = (a_tpos - rpos_eff).astype(np.int64)

    if len(diag) == 0:
        z = np.zeros(0, np.int32)
        return Candidates(z, z, z.astype(np.int8), z, z)

    # Group key: (read, path, strand); sub-key: diagonal bin.
    n_paths = int(index.path_cluster.shape[0])
    group = (a_read.astype(np.int64) * n_paths + a_path) * 2 + strand
    bins = (diag + (1 << 30)) // diag_bin  # shift to keep bins positive

    order = np.lexsort((bins, group))
    group_s = group[order]
    bins_s = bins[order]
    diag_s = diag[order]

    # Count anchors per (group, bin).
    pair_change = np.empty(len(group_s), dtype=bool)
    pair_change[0] = True
    np.not_equal(group_s[1:], group_s[:-1], out=pair_change[1:])
    bin_change = np.empty(len(group_s), dtype=bool)
    bin_change[0] = True
    np.not_equal(bins_s[1:], bins_s[:-1], out=bin_change[1:])
    seg_start = np.flatnonzero(pair_change | bin_change)
    seg_end = np.append(seg_start[1:], len(group_s))
    seg_group = group_s[seg_start]
    seg_bin = bins_s[seg_start]
    seg_count = seg_end - seg_start

    # Neighborhood support: this bin + adjacent bins of the same group.
    support = seg_count.copy()
    left_adj = (
        (np.arange(len(seg_start)) > 0)
        & (seg_group == np.roll(seg_group, 1))
        & (seg_bin == np.roll(seg_bin, 1) + 1)
    )
    right_adj = (
        (np.arange(len(seg_start)) < len(seg_start) - 1)
        & (seg_group == np.roll(seg_group, -1))
        & (seg_bin == np.roll(seg_bin, -1) - 1)
    )
    support = (
        seg_count
        + np.where(left_adj, np.roll(seg_count, 1), 0)
        + np.where(right_adj, np.roll(seg_count, -1), 0)
    )

    # Modal bin per group = the segment with max support.
    grp_change = np.empty(len(seg_group), dtype=bool)
    grp_change[0] = True
    np.not_equal(seg_group[1:], seg_group[:-1], out=grp_change[1:])
    grp_ids = np.cumsum(grp_change) - 1
    n_groups = int(grp_ids[-1]) + 1
    best_support = np.zeros(n_groups, dtype=np.int64)
    np.maximum.at(best_support, grp_ids, support)
    is_modal = support == best_support[grp_ids]
    # First modal segment per group wins.
    modal_idx = np.flatnonzero(is_modal)
    first_modal = np.full(n_groups, len(seg_group), dtype=np.int64)
    np.minimum.at(first_modal, grp_ids[modal_idx], modal_idx)

    sel = first_modal
    kept = best_support >= min_anchors
    sel = sel[kept]

    # d0 = median diagonal of the modal segment (its own bin only: adjacent
    # bins shift the center by at most diag_bin, absorbed by the DP band).
    med_idx = (seg_start[sel] + seg_end[sel] - 1) // 2
    d0 = diag_s[med_idx]

    group_sel = seg_group[sel]
    strand_out = (group_sel % 2).astype(np.int8)
    path_out = ((group_sel // 2) % n_paths).astype(np.int32)
    read_out = (group_sel // (2 * n_paths)).astype(np.int32)

    return Candidates(
        read=read_out,
        path=path_out,
        strand=strand_out,
        d0=d0.astype(np.int32),
        n_anchors=best_support[kept].astype(np.int32),
    )
