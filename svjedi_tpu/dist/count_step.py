"""Device-side DP → winner → count step, single-chip and sharded.

This is the framework's "training step" equivalent: one jitted function that
takes a fixed-shape batch of seeded DP problems and produces the dense
per-(tag, allele) support-count matrix. The sharded variant runs it under
``shard_map`` over a (data, graph) mesh:

- candidate batches sharded over ``data`` (each host/chip scores its reads);
- the tag (SV) space range-partitioned over ``graph`` — each graph shard
  masks its tag range, so the final ``psum`` over both axes reassembles the
  exact global counts (ranges are disjoint);
- one ``psum`` of the ``(n_tags, 2)`` int32 matrix is the only collective,
  riding ICI (SURVEY §2.2 / §5.8).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..align.extend import DPParams, band_dp_batch


class OwnedTable(NamedTuple):
    """Per-path owned-link table, padded to K columns (host-built)."""

    junction: jnp.ndarray  # (n_paths, K) int32 path-space junction offsets
    tag: jnp.ndarray  # (n_paths, K) int32 tag ids
    allele: jnp.ndarray  # (n_paths, K) int32 0/1
    valid: jnp.ndarray  # (n_paths, K) bool


@functools.partial(
    jax.jit,
    static_argnames=("band", "params", "n_groups", "n_tags", "d_over",
                     "min_score", "use_pallas"),
)
def dp_filter_count(
    q: jnp.ndarray,  # (P, M) int8 read windows
    t: jnp.ndarray,  # (P, M+band) int8 target windows
    t_start: jnp.ndarray,  # (P,) int32: path coord of target window lane 0
    group: jnp.ndarray,  # (P,) int32 winner-competition group id
    cand_path: jnp.ndarray,  # (P,) int32 panel path id
    owned: OwnedTable,
    band: int,
    params: DPParams,
    n_groups: int,
    n_tags: int,
    d_over: int = 100,
    min_score: int = 40,
    use_pallas: bool = False,
    tag_lo: jnp.ndarray | int = 0,
    tag_hi: jnp.ndarray | int = 1 << 30,
) -> Dict[str, jnp.ndarray]:
    """DP-score a candidate batch, pick per-group winners, count tags."""
    if use_pallas:
        from ..kernels.band_dp import band_dp_pallas

        out = band_dp_pallas(q, t, band, params)
    else:
        out = band_dp_batch(q, t, band, params)
    score = out["score"].astype(jnp.int32)
    ts = out["ts"].astype(jnp.int32) + t_start
    te = out["te"].astype(jnp.int32) + t_start

    # Per-group winner (first index achieving the max qualifying score).
    qual = score >= min_score
    eff = jnp.where(qual, score, -1)
    best = jax.ops.segment_max(eff, group, num_segments=n_groups)
    n = q.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(1 << 30)
    tied = (eff == best[group]) & qual
    first = jax.ops.segment_min(
        jnp.where(tied, idx, big), group, num_segments=n_groups
    )
    is_winner = tied & (idx == first[group])

    # Junction-coverage test for every owned link of the winner's path.
    oj = owned.junction[cand_path]  # (P, K)
    otag = owned.tag[cand_path]
    oall = owned.allele[cand_path]
    ovalid = owned.valid[cand_path]
    covers = (
        ovalid
        & is_winner[:, None]
        & ((oj - ts[:, None]) >= d_over)
        & ((te[:, None] - oj + 1) >= d_over)
        & (otag >= tag_lo)
        & (otag < tag_hi)
    )
    flat = (otag * 2 + oall).reshape(-1)
    contrib = covers.astype(jnp.int32).reshape(-1)
    counts = jax.ops.segment_sum(contrib, flat, num_segments=2 * n_tags)
    return {
        "counts": counts.reshape(n_tags, 2),
        "score": score,
        "ts": ts,
        "te": te,
        "is_winner": is_winner,
    }


def build_owned_table(panel, tag_to_id: Dict[str, int], k_max: int = 0) -> OwnedTable:
    """Pad each panel path's owned-link list into the device table."""
    import numpy as np

    K = max([len(p.owned) for p in panel.paths] + [1, k_max])
    n = len(panel.paths)
    junction = np.zeros((n, K), dtype=np.int32)
    tag = np.zeros((n, K), dtype=np.int32)
    allele = np.zeros((n, K), dtype=np.int32)
    valid = np.zeros((n, K), dtype=bool)
    for pid, path in enumerate(panel.paths):
        for col, (t, a, j, _li) in enumerate(path.owned):
            junction[pid, col] = j
            tag[pid, col] = tag_to_id[t]
            allele[pid, col] = a
            valid[pid, col] = True
    return OwnedTable(
        junction=jnp.asarray(junction),
        tag=jnp.asarray(tag),
        allele=jnp.asarray(allele),
        valid=jnp.asarray(valid),
    )


def make_sharded_count_step(
    mesh: Mesh,
    band: int,
    params: DPParams,
    n_groups_per_shard: int,
    n_tags: int,
    d_over: int = 100,
    min_score: int = 40,
    use_pallas: bool = False,
):
    """Build the jitted multi-chip count step over a (data, graph) mesh.

    Inputs are sharded over ``data`` on their leading (candidate) axis and
    replicated over ``graph``; each graph shard computes its disjoint tag
    range; the count matrix is psum'd over the whole mesh and returned
    replicated.
    """
    n_graph = mesh.shape["graph"]
    tags_per_shard = -(-n_tags // n_graph)

    def step(q, t, t_start, group, cand_path, owned):
        gidx = jax.lax.axis_index("graph")
        lo = gidx * tags_per_shard
        hi = jnp.minimum(lo + tags_per_shard, n_tags)
        out = dp_filter_count(
            q, t, t_start, group, cand_path, owned,
            band=band, params=params,
            n_groups=n_groups_per_shard, n_tags=n_tags,
            d_over=d_over, min_score=min_score, use_pallas=use_pallas,
            tag_lo=lo, tag_hi=hi,
        )
        counts = jax.lax.psum(out["counts"], axis_name=("data", "graph"))
        return counts

    spec_data = P("data")
    return jax.jit(
        jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(
                spec_data, spec_data, spec_data, spec_data, spec_data,
                P(),  # owned table replicated
            ),
            out_specs=P(),  # counts replicated
            check_vma=False,
        )
    )
