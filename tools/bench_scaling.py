"""Sharding-efficiency measurement for the data-parallel align stage.

The BASELINE.md scaling gate is >=80% reads/s efficiency from 1 host to N.
This host exposes ONE real TPU chip (axon tunnel) and 2 CPU cores, so
N-chip wall-clock cannot be measured directly; this tool measures the two
quantities that BOUND multi-chip efficiency on the REAL workload (the
test-dir bundle) and prints the derived bound:

1. **Sharding overhead**: the v3 on-mesh count step (shard_map + psum, one
   1-device mesh) vs the plain single-device step on identical problems —
   the cost of the SPMD wrapping itself (partitioned prep + collective
   epilogue), timed over many dispatches.
2. **Load balance**: the production multi-chip mode round-robins read
   chunks over devices (align_and_count(devices=...)); per-chunk DP cell
   volume from real seeding gives balance = mean(per-device volume) /
   max(per-device volume) for 8 devices.

Per-chip work is independent — the ONLY collective is one (n_tags, 2)
int32 psum (microseconds on ICI) — so projected N-chip efficiency
~= balance / overhead.

Usage: python tools/bench_scaling.py [--cpu]
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TEST_DIR = Path("/root/reference/test-dir")


def main():
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from svjedi_tpu.align import device as dev
    from svjedi_tpu.align.index import build_panel_index
    from svjedi_tpu.align.pipeline import candidate_layout
    from svjedi_tpu.align.seed import ChainParams, seed_candidates
    from svjedi_tpu.config import AlignConfig
    from svjedi_tpu.dist.count_step import build_owned_table
    from svjedi_tpu.dist.engine import (
        dp_filter_count_v3, make_sharded_count_step_v3,
    )
    from svjedi_tpu.dist.mesh import make_mesh
    from svjedi_tpu.graph.build import build_graph
    from svjedi_tpu.graph.cluster import build_panel
    from svjedi_tpu.graph.svparse import parse_vcf_svs
    from svjedi_tpu.io.fasta import read_fasta
    from svjedi_tpu.io.fastq import read_reads

    on_cpu = jax.devices()[0].platform == "cpu"
    engine = "xla" if on_cpu else "v3"

    cfg = AlignConfig(buckets=(2048,))
    chroms = read_fasta(TEST_DIR / "reference_genome.fasta")
    parsed = parse_vcf_svs(
        TEST_DIR / "test.vcf", {c: len(s) for c, s in chroms.items()}
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
    reads = read_reads(str(TEST_DIR / "simulated_reads.fastq.gz"))
    cands = seed_candidates(reads, index, chain_params=ChainParams(
        min_anchors=cfg.min_anchors, max_chains=cfg.max_chains,
        max_gap=cfg.chain_max_gap, drift_abs=cfg.chain_drift_abs,
        drift_permille=cfg.chain_drift_permille,
        block_rows=cfg.block_rows,
        ext_min_anchors=cfg.chain_ext_min_anchors,
    ))
    data = dev.upload(reads.codes, panel)
    rw_start, m32, keep, q_start, t_start, t_lo, t_hi = candidate_layout(
        reads, index, cands, cfg, data
    )
    sel = np.flatnonzero(keep & (m32 <= 2048))
    P = (len(sel) // 1024) * 1024  # real problems only, 1024-aligned
    sel = sel[:P]
    meta = np.stack(
        [q_start[sel], m32[sel], t_start[sel], t_lo[sel], t_hi[sel]]
    ).astype(np.int32)
    path_start = data.panel_start[cands.path[sel]].astype(np.int32)
    cluster = index.path_cluster[cands.path[sel]].astype(np.int64)
    n_clusters = int(index.path_cluster.max()) + 1
    # Densify (read, cluster) keys before narrowing: the int64 product
    # overflows int32 at production scale (millions of reads x thousands of
    # clusters) and wrapped ids would collide distinct winner groups.
    gkey = cands.read[sel].astype(np.int64) * n_clusters + cluster
    group = np.unique(gkey, return_inverse=True)[1].astype(np.int32)
    cand_path = cands.path[sel].astype(np.int32)
    tags = sorted({t for p in panel.paths for t, *_ in p.owned})
    owned = build_owned_table(panel, {t_: i for i, t_ in enumerate(tags)})
    n_groups = int(group.max()) + 1

    rw, rn, pw, pn = data.packed_words()
    args = (rw, rn, pw, pn, meta, path_start, group, cand_path, owned)
    kw = dict(bucket=2048, band=cfg.band, params=__import__(
        "svjedi_tpu.align.extend", fromlist=["DPParams"]).DPParams(),
        n_groups=n_groups, n_tags=max(1, len(tags)))

    def timeit(fn, reps=8):
        np.asarray(fn())  # warm/compile (device_get forces execution; the
        # tunnel's block_until_ready resolves before remote work finishes)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        np.asarray(out)
        return (time.perf_counter() - t0) / reps

    t_single = timeit(
        lambda: dp_filter_count_v3(*args, engine=engine, **kw)["counts"]
    )
    mesh1 = make_mesh(
        data_shards=1, graph_shards=1, devices=jax.devices()[:1]
    )
    step1 = make_sharded_count_step_v3(
        mesh1, engine=engine, bucket=2048, band=cfg.band,
        params=kw["params"], n_groups_per_shard=n_groups,
        n_tags=kw["n_tags"],
    )
    t_sharded = timeit(lambda: step1(*args))
    overhead = t_sharded / t_single

    # Load balance: per-device DP volume of the production chunk
    # round-robin at the bench workload size (test-dir reads x10 = 5,190
    # reads, the BENCH_r JSON configuration; run_pipeline shrinks
    # chunk_reads so all devices get work). Volumes repeat per replica, so
    # compute one replica's per-read volume and tile it.
    n_dev = 8
    reps10 = 10
    n_reads10 = reads.n_reads * reps10
    chunk = max(512, -(-n_reads10 // n_dev))
    cell1 = np.zeros(reads.n_reads)
    np.add.at(
        cell1, cands.read[keep],
        m32[keep].astype(np.float64) * cfg.band,
    )
    cell10 = np.tile(cell1, reps10)
    vol = np.array([
        cell10[di * chunk : (di + 1) * chunk].sum() for di in range(n_dev)
    ])
    balance = float(vol.mean() / max(1.0, vol.max()))

    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "engine": engine,
        "n_problems": int(P),
        "t_single_s": round(t_single, 4),
        "t_sharded_1dev_s": round(t_sharded, 4),
        "sharding_overhead_x": round(overhead, 3),
        "load_balance_8dev_chunks": round(balance, 3),
        "projected_8chip_efficiency": round(
            min(1.0, balance / max(overhead, 1e-9)), 3
        ),
    }))


if __name__ == "__main__":
    main()
