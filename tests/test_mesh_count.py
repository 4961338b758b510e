"""On-mesh SPMD count merge == host count_support, end to end.

Three tiers:
1. numpy semantics reference (count_entries_np) == count_support on the
   real test-dir winner set;
2. the jitted shard_map step on a (4, 2) virtual-CPU mesh == the numpy
   reference == the host dict;
3. the full CLI-level pipeline with graph_shards=2 writes a VCF byte-equal
   to the plain run (the round-2 verdict's "done" criterion for shipping
   the on-mesh engine).
"""

import numpy as np
import pytest

import jax

from conftest import TEST_DATA, require_reference

from svjedi_tpu.align.index import build_panel_index
from svjedi_tpu.align.pipeline import align_and_count, count_support
from svjedi_tpu.config import (
    AlignConfig, DistConfig, GenotypeConfig, PipelineConfig,
)
from svjedi_tpu.dist.count_merge import (
    build_entry_table, count_entries_np, mesh_count_support,
)
from svjedi_tpu.dist.mesh import make_mesh
from svjedi_tpu.graph.build import build_graph
from svjedi_tpu.graph.cluster import build_panel
from svjedi_tpu.graph.svparse import parse_vcf_svs
from svjedi_tpu.io.fasta import read_fasta
from svjedi_tpu.io.fastq import read_reads


@pytest.fixture(scope="module")
def winner_setup():
    require_reference()
    cfg = AlignConfig()
    gcfg = GenotypeConfig()
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
    reads = read_reads(str(TEST_DATA / "simulated_reads.fastq.gz"))
    counts, _, winners = align_and_count(
        reads, panel, index, cfg, gcfg, collect_audit=False,
        chunk_reads=128,  # several chunks: winner merge order exercised
    )
    return panel, reads, winners, counts, gcfg


def test_numpy_reference_matches_count_support(winner_setup):
    panel, reads, winners, counts, gcfg = winner_setup
    tags = sorted({t for p in panel.paths for t, *_ in p.owned})
    tag_to_id = {t: i for i, t in enumerate(tags)}
    for n_shards in (1, 3, 8):
        et = build_entry_table(
            panel, winners, tag_to_id, n_shards=n_shards,
            min_density=gcfg.min_count_density,
        )
        mat = count_entries_np(et, len(tags), gcfg.d_over)
        got = {
            t: [int(mat[i, 0]), int(mat[i, 1])]
            for i, t in enumerate(tags)
            if mat[i].any()
        }
        assert got == counts, f"n_shards={n_shards}"


def test_mesh_step_matches_host(winner_setup):
    panel, reads, winners, counts, gcfg = winner_setup
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    mesh = make_mesh(
        data_shards=4, graph_shards=2, devices=jax.devices()[:8]
    )
    got = mesh_count_support(
        panel, winners, mesh, d_over=gcfg.d_over,
        min_density=gcfg.min_count_density,
    )
    assert got == counts


def test_full_run_graph_shards_byte_equal(tmp_path):
    require_reference()
    from svjedi_tpu.pipeline import run_pipeline

    outs = {}
    for name, dist in (
        ("plain", DistConfig()),
        ("mesh", DistConfig(data_shards=4, graph_shards=2)),
    ):
        cfg = PipelineConfig(
            vcf=TEST_DATA / "test.vcf",
            ref=TEST_DATA / "reference_genome.fasta",
            reads=(str(TEST_DATA / "simulated_reads.fastq.gz"),),
            prefix=str(tmp_path / name),
            dist=dist,
            keep_artifacts=False,
        )
        res = run_pipeline(cfg)
        outs[name] = open(res["output_vcf"]).read()
        if name == "mesh":
            assert res["stats"].counters.get("mesh") == "4x2"
    assert outs["mesh"] == outs["plain"]
