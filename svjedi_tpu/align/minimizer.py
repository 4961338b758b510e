"""Vectorized minimizer extraction (minimap2/minigraph-style seeding).

Canonical k-mers (min of forward / reverse-complement value) hashed with a
64-bit mixer; the leftmost-argmin position of each w-window is a minimizer.
Pure numpy (hot path is simple integer ops; the per-read volume is small
relative to DP, and the same code vectorizes on device later if it ever
shows up in profiles).

Sensitivity, not parity, is the requirement here: the reference's minigraph
uses (k=15, w=10) with its own hash; any good minimizer scheme that finds
the same loci works (SURVEY §7.3a).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

#: Sentinel hash for invalid (N-containing) k-mer positions.
_INVALID = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public-domain mixing constants)."""
    x = x.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _INVALID
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _INVALID
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _INVALID
    return x ^ (x >> np.uint64(31))


@dataclass
class Minimizers:
    pos: np.ndarray  # int32 k-mer start positions
    hash: np.ndarray  # uint64 canonical hashes
    strand: np.ndarray  # int8: 0 = forward k-mer is canonical, 1 = revcomp


def extract_minimizers(codes: np.ndarray, k: int, w: int) -> Minimizers:
    """Minimizers of an int8 code sequence (A,C,G,T->0..3, other->4)."""
    n = len(codes)
    if n < k:
        return Minimizers(
            np.zeros(0, np.int32), np.zeros(0, np.uint64), np.zeros(0, np.int8)
        )
    windows = np.lib.stride_tricks.sliding_window_view(codes, k).astype(np.uint64)
    powers = (np.uint64(4) ** np.arange(k - 1, -1, -1, dtype=np.uint64))
    fwd = windows @ powers
    rc = (np.uint64(3) - windows) @ powers[::-1]
    valid = (windows < 4).all(axis=1)

    canonical = np.minimum(fwd, rc)
    strand = (rc < fwd).astype(np.int8)
    with np.errstate(over="ignore"):
        hashes = _mix64(canonical)
    # Invalidate N-containing and strand-ambiguous (palindromic) k-mers.
    hashes = np.where(valid & (fwd != rc), hashes, _INVALID)

    n_kmers = len(hashes)
    if n_kmers < w:
        w = n_kmers
    win = np.lib.stride_tricks.sliding_window_view(hashes, w)
    argmin = win.argmin(axis=1) + np.arange(len(win), dtype=np.int64)
    pos = np.unique(argmin)
    pos = pos[hashes[pos] != _INVALID]
    return Minimizers(
        pos=pos.astype(np.int32),
        hash=hashes[pos],
        strand=strand[pos],
    )
