"""Alignment pipeline: seeds → bucketed DP batches → winners → allele counts.

Winner-takes-the-cluster: every candidate (read, path, strand) gets a banded
DP score; the best-scoring path per (read, cluster) decides which tagged
links the read crosses (branch competition, see graph/cluster.py), and each
crossed link is counted when the aligned span covers its junction with
>= d_over bases on both sides — the exact filter-alignments.py:258-273 rule
expressed in path coordinates.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import AlignConfig, GenotypeConfig
from ..graph.cluster import Panel
from ..io.fastq import ReadSet
from .extend import DPParams, band_dp_batch
from .index import PanelIndex
from .seed import Candidates, seed_candidates


@dataclass
class Winners:
    """Winning alignment per (read, cluster), flat arrays."""

    read: np.ndarray
    cluster: np.ndarray
    path: np.ndarray
    strand: np.ndarray
    score: np.ndarray
    #: Alignment span: read coords are in the *oriented* read (reverse-
    #: complemented for strand 1); target coords are trimmed path coords.
    qs: np.ndarray
    qe: np.ndarray
    ts: np.ndarray
    te: np.ndarray


def revcomp_codes(codes: np.ndarray) -> np.ndarray:
    rc = codes[::-1].copy()
    mask = rc < 4
    rc[mask] = 3 - rc[mask]
    return rc


def _pick_bucket(m: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if m <= b:
            return b
    return buckets[-1]


def candidate_windows(
    reads: ReadSet,
    index: PanelIndex,
    cands: Candidates,
    cfg: AlignConfig,
):
    """Per-candidate read-window bounds + junction-reachability prune.

    Returns (rw_start, rw_end, m, keep): the oriented-read window [rw_start,
    rw_end) each candidate aligns from, its length m, and the keep mask.

    The prune: a (read, cluster) whose target coverage cannot put d_over
    bases on both sides of any junction of any of its paths can never
    contribute a count — reads confined to shared flanks are dropped as a
    group. The test is necessary-only (first/last junction bounds + band
    slop), so no countable alignment is ever dropped.
    """
    B = cfg.band
    slack = 2 * cfg.diag_bin
    rlen = reads.lengths
    path_len = index.path_len[cands.path]
    cand_rlen = rlen[cands.read]
    rw_start = np.clip(-cands.d0.astype(np.int64) - B // 2 - slack, 0, cand_rlen)
    rw_end = np.clip(
        path_len.astype(np.int64) - cands.d0 + B // 2 + slack, 0, cand_rlen
    )
    m = (rw_end - rw_start).astype(np.int64)
    keep = m >= index.k

    d_over = 100
    margin = B // 2 + cfg.diag_bin
    t_lo = cands.d0.astype(np.int64) + rw_start - margin
    t_hi = cands.d0.astype(np.int64) + rw_end + margin
    possible = (
        (t_lo <= index.path_last_j[cands.path] - d_over)
        & (t_hi >= index.path_first_j[cands.path] + d_over)
    )
    if len(cands):
        cluster_key = (
            cands.read.astype(np.int64) * (int(index.path_cluster.max()) + 1)
            + index.path_cluster[cands.path]
        )
        order_k = np.argsort(cluster_key, kind="stable")
        ck_sorted = cluster_key[order_k]
        group_start = np.ones(len(ck_sorted), dtype=bool)
        group_start[1:] = ck_sorted[1:] != ck_sorted[:-1]
        group_ids = np.cumsum(group_start) - 1
        any_possible = np.zeros(group_ids[-1] + 1, bool)
        np.logical_or.at(any_possible, group_ids, possible[order_k])
        keep[order_k] &= any_possible[group_ids]
    return rw_start, rw_end, m, keep


def build_problem_batches(
    reads: ReadSet,
    panel: Panel,
    index: PanelIndex,
    cands: Candidates,
    cfg: AlignConfig,
    batch_size: int = 512,
):
    """Yield fixed-shape DP problem batches for a candidate set.

    Host-materialized variant (tests/debug); the production path gathers
    windows on device (align/device.py). Yields ``(chunk_indices, q_batch,
    t_batch, t_starts, rw_start_chunk)`` per batch, grouped by bucket.
    """
    B = cfg.band
    path_len = index.path_len[cands.path]
    rw_start, rw_end, m, keep = candidate_windows(reads, index, cands, cfg)
    order = np.flatnonzero(keep)
    bucket_of = np.array(
        [_pick_bucket(int(v), cfg.buckets) for v in m[order]], dtype=np.int64
    )

    rc_cache: Dict[int, np.ndarray] = {}

    def oriented_read(read_id: int, strand: int) -> np.ndarray:
        if strand == 0:
            return reads.seq(read_id)
        if read_id not in rc_cache:
            rc_cache[read_id] = revcomp_codes(reads.seq(read_id))
        return rc_cache[read_id]

    for bucket in sorted(set(bucket_of.tolist())):
        sel = order[bucket_of == bucket]
        for lo in range(0, len(sel), batch_size):
            chunk = sel[lo : lo + batch_size]
            P = len(chunk)
            q_batch = np.full((P, bucket), 4, dtype=np.int8)
            t_batch = np.full((P, bucket + B), 4, dtype=np.int8)
            t_starts = np.zeros(P, dtype=np.int64)
            for row, ci in enumerate(chunk):
                read_id = int(cands.read[ci])
                strand = int(cands.strand[ci])
                a, b = int(rw_start[ci]), int(rw_end[ci])
                window = oriented_read(read_id, strand)[a:b]
                q_batch[row, : len(window)] = window
                # Target window so that band cell (i, k) ↔ path position
                # t_start + i + k with t_start = (d0 + a) - B/2.
                t_start = int(cands.d0[ci]) + a - B // 2
                t_starts[row] = t_start
                pl = int(path_len[ci])
                src_lo = max(0, t_start)
                src_hi = min(pl, t_start + bucket + B)
                if src_hi > src_lo:
                    dst_lo = src_lo - t_start
                    seq = panel.paths[int(cands.path[ci])].seq
                    t_batch[row, dst_lo : dst_lo + (src_hi - src_lo)] = seq[
                        src_lo:src_hi
                    ]
            yield chunk, q_batch, t_batch, t_starts, rw_start[chunk]


def _pad_sizes(batch_size: int):
    """Tail-chunk pad sizes: one small + the full size.

    Keeping the compiled-shape set tiny matters more than padded-row waste:
    every distinct (P, bucket) pair is a separate Mosaic compile, and
    compiles through the TPU tunnel cost seconds.
    """
    return [min(256, batch_size), batch_size]


def align_candidates(
    reads: ReadSet,
    panel: Panel,
    index: PanelIndex,
    cands: Candidates,
    cfg: AlignConfig,
    batch_size: int = 1024,
    device_data=None,
) -> Winners:
    """Score all candidates and reduce to per-(read, cluster) winners.

    All sequence data lives on the device (align/device.py); each batch is
    dispatched with a few int32 metadata vectors and the results stream back
    asynchronously.
    """
    from . import device as dev

    import jax

    B = cfg.band
    params = DPParams(
        match=cfg.match,
        mismatch=cfg.mismatch,
        gap_open=cfg.gap_open,
        gap_extend=cfg.gap_extend,
    )
    engine = "gather" if jax.default_backend() == "cpu" else "dma"

    n = len(cands)
    out_score = np.zeros(n, dtype=np.int64)
    out_qs = np.zeros(n, dtype=np.int64)
    out_qe = np.full(n, -1, dtype=np.int64)
    out_ts = np.zeros(n, dtype=np.int64)
    out_te = np.full(n, -1, dtype=np.int64)
    if n == 0:
        empty = np.zeros(0, np.int64)
        return Winners(*([empty] * 9))

    if device_data is None:
        device_data = dev.upload(reads.codes, panel)

    rw_start, rw_end, m, keep = candidate_windows(reads, index, cands, cfg)
    order = np.flatnonzero(keep)
    bucket_of = np.array(
        [_pick_bucket(int(v), cfg.buckets) for v in m[order]], dtype=np.int64
    )

    # Per-candidate window metadata (indices into the device layout; see
    # align/device.py invariants). Reverse-strand windows address the rc
    # half with positive stride.
    N = device_data.n_bases
    read_off = reads.offsets[cands.read]
    read_end = reads.offsets[cands.read + 1]
    q_start = np.where(
        cands.strand == 0,
        read_off + rw_start,
        N + (N - read_end) + rw_start,
    ).astype(np.int32)
    t_start_rel = cands.d0.astype(np.int64) + rw_start - B // 2
    path_start = device_data.panel_start[cands.path]
    t_start = (path_start + t_start_rel).astype(np.int32)
    t_lo = path_start.astype(np.int32)
    t_hi = (path_start + device_data.panel_len[cands.path]).astype(np.int32)
    m32 = m.astype(np.int32)

    pad_sizes = _pad_sizes(batch_size)

    def padded(P: int) -> int:
        for s in pad_sizes:
            if P <= s:
                return s
        return batch_size

    pending = []
    for bucket in sorted(set(bucket_of.tolist())):
        sel = order[bucket_of == bucket]
        for lo in range(0, len(sel), batch_size):
            chunk = sel[lo : lo + batch_size]
            P = len(chunk)
            Ppad = padded(P)

            def take(arr, fill=0):
                out = np.full(Ppad, fill, dtype=np.int32)
                out[:P] = arr[chunk]
                return out

            result = dev.window_score(
                device_data.reads2,
                device_data.panel_padded,
                take(q_start),
                take(m32),  # padding rows get m=0 → empty problems
                take(t_start),
                take(t_lo),
                take(t_hi, 0),
                bucket=int(bucket),
                band=B,
                params=params,
                engine=engine,
            )
            pending.append((chunk, result))

    for chunk, result in pending:
        P = len(chunk)
        out_score[chunk] = np.asarray(result["score"][:P])
        out_qs[chunk] = np.asarray(result["qs"][:P]) + rw_start[chunk]
        out_qe[chunk] = np.asarray(result["qe"][:P]) + rw_start[chunk]
        t_starts = cands.d0[chunk].astype(np.int64) + rw_start[chunk] - B // 2
        out_ts[chunk] = np.asarray(result["ts"][:P]) + t_starts
        out_te[chunk] = np.asarray(result["te"][:P]) + t_starts

    # ---- winner per (read, cluster) ----
    cluster = index.path_cluster[cands.path].astype(np.int64)
    ok = out_score >= cfg.min_score
    idx = np.flatnonzero(ok)
    if len(idx) == 0:
        empty = np.zeros(0, np.int64)
        return Winners(*([empty] * 9))
    key = cands.read[idx].astype(np.int64) * (cluster.max() + 1) + cluster[idx]
    order2 = np.lexsort((-out_score[idx], key))
    idx = idx[order2]
    key = key[order2]
    first = np.ones(len(idx), dtype=bool)
    first[1:] = key[1:] != key[:-1]
    win = idx[first]

    return Winners(
        read=cands.read[win].astype(np.int64),
        cluster=cluster[win],
        path=cands.path[win].astype(np.int64),
        strand=cands.strand[win].astype(np.int64),
        score=out_score[win],
        qs=out_qs[win],
        qe=out_qe[win],
        ts=out_ts[win],
        te=out_te[win],
    )


def count_support(
    panel: Panel,
    winners: Winners,
    reads: ReadSet,
    d_over: int = 100,
    collect_audit: bool = True,
) -> Tuple[Dict[str, List[int]], Dict[str, List[List[str]]]]:
    """Per-(SV, allele) support counts from winning alignments.

    Returns (counts, audit) where counts maps lookup tags to [ref, alt] and
    audit mirrors the reference's informative_aln.json schema (GAF-like
    lines per counted alignment, filter-alignments.py:163-166).
    """
    counts: Dict[str, List[int]] = {}
    audit: Dict[str, List[List[str]]] = {}
    for i in range(len(winners.read)):
        path = panel.paths[int(winners.path[i])]
        ts, te = int(winners.ts[i]), int(winners.te[i])
        crossed = False
        for tag, allele, j in path.owned:
            if (j - ts) >= d_over and (te - j + 1) >= d_over:
                entry = counts.setdefault(tag, [0, 0])
                entry[allele] += 1
                crossed = True
                if collect_audit:
                    line = _audit_line(panel, winners, reads, i)
                    audit.setdefault(tag, [[], []])[allele].append(line)
    return counts, audit


def _audit_line(panel: Panel, w: Winners, reads: ReadSet, i: int) -> str:
    from ..graph.build import REV

    path = panel.paths[int(w.path[i])]
    graph = panel.graph
    read_id = int(w.read[i])
    rlen = int(reads.lengths[read_id])
    strand = int(w.strand[i])
    qs, qe = int(w.qs[i]), int(w.qe[i])
    if strand:  # report on the forward read
        qs, qe = rlen - 1 - qe, rlen - 1 - qs
    path_str = "".join(
        ("<" if s == REV else ">") + graph.nodes[n].name for (n, s) in path.states
    )
    ts_full = int(w.ts[i]) + path.trim_left
    te_full = int(w.te[i]) + path.trim_left
    return "\t".join(
        [
            reads.names[read_id],
            str(rlen),
            str(qs),
            str(qe + 1),
            "+-"[strand],
            path_str,
            str(path.full_len),
            str(ts_full),
            str(te_full + 1),
            str(int(w.score[i])),
            str(te_full - ts_full + 1),
            "60",
        ]
    ) + "\t"


def align_and_count(
    reads: ReadSet,
    panel: Panel,
    index: PanelIndex,
    align_cfg: AlignConfig,
    genotype_cfg: GenotypeConfig,
    collect_audit: bool = True,
    timings: Optional[Dict[str, float]] = None,
    chunk_reads: int = 2048,
    batch_size: int = 4096,
):
    """Full aligner stage: reads + panel → (counts, audit, winners).

    Reads stream in fixed-size chunks: host buffers stay warm (this matters
    on sandboxed hosts where first-touch page allocation is expensive),
    memory stays bounded, and the chunk loop is the natural per-host unit of
    the data-parallel distribution model (ARCHITECTURE.md).
    """
    import time

    from . import device as dev

    if timings is not None:
        timings.setdefault("seed_s", 0.0)
        timings.setdefault("dp_s", 0.0)
        timings.setdefault("count_s", 0.0)
        timings.setdefault("n_candidates", 0)
        timings.setdefault("n_winners", 0)

    counts: Dict[str, List[int]] = {}
    audit: Dict[str, List[List[str]]] = {}
    winner_parts: List[Winners] = []
    panel_cache: Dict = {}

    for start in range(0, max(reads.n_reads, 1), chunk_reads):
        stop = min(start + chunk_reads, reads.n_reads)
        if start >= stop:
            break
        chunk = reads.slice(start, stop)

        t0 = time.perf_counter()
        cands = seed_candidates(
            chunk, index, align_cfg.min_anchors, align_cfg.diag_bin
        )
        t1 = time.perf_counter()
        device_data = dev.upload(chunk.codes, panel, panel_cache)
        winners = align_candidates(
            chunk, panel, index, cands, align_cfg,
            batch_size=batch_size, device_data=device_data,
        )
        t2 = time.perf_counter()
        chunk_counts, chunk_audit = count_support(
            panel, winners, chunk, genotype_cfg.d_over, collect_audit
        )
        t3 = time.perf_counter()

        for tag, pair in chunk_counts.items():
            entry = counts.setdefault(tag, [0, 0])
            entry[0] += pair[0]
            entry[1] += pair[1]
        for tag, pair in chunk_audit.items():
            entry = audit.setdefault(tag, [[], []])
            entry[0].extend(pair[0])
            entry[1].extend(pair[1])
        winners.read = winners.read + start  # rebase to global read ids
        winner_parts.append(winners)

        if timings is not None:
            timings["seed_s"] += t1 - t0
            timings["dp_s"] += t2 - t1
            timings["count_s"] += t3 - t2
            timings["n_candidates"] += len(cands)
            timings["n_winners"] += int(len(winners.read))

    if winner_parts:
        merged = Winners(
            *[
                np.concatenate([getattr(w, f) for w in winner_parts])
                for f in (
                    "read", "cluster", "path", "strand", "score",
                    "qs", "qe", "ts", "te",
                )
            ]
        )
    else:
        empty = np.zeros(0, np.int64)
        merged = Winners(*([empty] * 9))
    return counts, audit, merged
