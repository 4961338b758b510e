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


def _dp_engine():
    """Pick the DP engine: Pallas kernel on TPU, XLA scan elsewhere."""
    import jax

    if jax.default_backend() not in ("cpu",):
        from ..kernels.band_dp import band_dp_pallas

        def tpu_engine(q, t, band, params):
            # The kernel tiles problems in sublane groups of 8.
            P = q.shape[0]
            pad = (-P) % 8
            if pad:
                import numpy as _np

                q = _np.concatenate([q, _np.full((pad, q.shape[1]), 4, q.dtype)])
                t = _np.concatenate([t, _np.full((pad, t.shape[1]), 4, t.dtype)])
            out = band_dp_pallas(q, t, band, params)
            return {k: v[:P] for k, v in out.items()}

        return tpu_engine
    return band_dp_batch


def build_problem_batches(
    reads: ReadSet,
    panel: Panel,
    index: PanelIndex,
    cands: Candidates,
    cfg: AlignConfig,
    batch_size: int = 512,
):
    """Yield fixed-shape DP problem batches for a candidate set.

    Yields ``(chunk_indices, q_batch, t_batch, t_starts, rw_start_chunk)``
    per batch, grouped by read-window length bucket. Shared by the host
    aligner, the device count step, and the benchmarks.
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

    # Junction-reachability prune: a (read, cluster) whose target coverage
    # cannot put d_over bases on both sides of any junction of any of its
    # paths can never contribute a count — and reads confined to shared
    # flanks are the common case, so this cuts DP volume hard. The test is
    # necessary-only (first/last junction bounds + band slop), so no
    # countable alignment is ever dropped.
    d_over = 100
    margin = B // 2 + cfg.diag_bin
    t_lo = cands.d0.astype(np.int64) + rw_start - margin
    t_hi = cands.d0.astype(np.int64) + rw_end + margin
    possible = (
        (t_lo <= index.path_last_j[cands.path] - d_over)
        & (t_hi >= index.path_first_j[cands.path] + d_over)
    )
    cluster_key = (
        cands.read.astype(np.int64) * (int(index.path_cluster.max()) + 1)
        + index.path_cluster[cands.path]
    )
    order_k = np.argsort(cluster_key, kind="stable")
    ck_sorted = cluster_key[order_k]
    group_start = np.ones(len(ck_sorted), dtype=bool)
    group_start[1:] = ck_sorted[1:] != ck_sorted[:-1]
    group_ids = np.cumsum(group_start) - 1
    any_possible = np.zeros(group_ids[-1] + 1 if len(group_ids) else 0, bool)
    np.logical_or.at(any_possible, group_ids, possible[order_k])
    keep_sorted = any_possible[group_ids]
    keep[order_k] &= keep_sorted

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


def align_candidates(
    reads: ReadSet,
    panel: Panel,
    index: PanelIndex,
    cands: Candidates,
    cfg: AlignConfig,
    batch_size: int = 512,
) -> Winners:
    """Score all candidates and reduce to per-(read, cluster) winners."""
    dp = _dp_engine()
    B = cfg.band
    params = DPParams(
        match=cfg.match,
        mismatch=cfg.mismatch,
        gap_open=cfg.gap_open,
        gap_extend=cfg.gap_extend,
    )

    n = len(cands)
    out_score = np.zeros(n, dtype=np.int64)
    out_qs = np.zeros(n, dtype=np.int64)
    out_qe = np.full(n, -1, dtype=np.int64)
    out_ts = np.zeros(n, dtype=np.int64)
    out_te = np.full(n, -1, dtype=np.int64)

    # Dispatch every batch asynchronously, then sync once: device dispatch
    # latency overlaps with host-side construction of the next batch.
    pending = []
    for chunk, q_batch, t_batch, t_starts, rw_start_chunk in (
        build_problem_batches(reads, panel, index, cands, cfg, batch_size)
    ):
        result = dp(q_batch, t_batch, B, params)
        pending.append((chunk, t_starts, rw_start_chunk, result))

    for chunk, t_starts, rw_start_chunk, result in pending:
        out_score[chunk] = np.asarray(result["score"])
        out_qs[chunk] = np.asarray(result["qs"]) + rw_start_chunk
        out_qe[chunk] = np.asarray(result["qe"]) + rw_start_chunk
        out_ts[chunk] = np.asarray(result["ts"]) + t_starts
        out_te[chunk] = np.asarray(result["te"]) + t_starts

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
):
    """Full aligner stage: reads + panel → (counts, audit, winners)."""
    import time

    t0 = time.perf_counter()
    cands = seed_candidates(
        reads, index, align_cfg.min_anchors, align_cfg.diag_bin
    )
    t1 = time.perf_counter()
    winners = align_candidates(reads, panel, index, cands, align_cfg)
    t2 = time.perf_counter()
    counts, audit = count_support(
        panel, winners, reads, genotype_cfg.d_over, collect_audit
    )
    t3 = time.perf_counter()
    if timings is not None:
        timings["seed_s"] = t1 - t0
        timings["dp_s"] = t2 - t1
        timings["count_s"] = t3 - t2
        timings["n_candidates"] = len(cands)
        timings["n_winners"] = int(len(winners.read))
    return counts, audit, winners
