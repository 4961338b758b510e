"""Byte-parity of the graph builder against the reference's outputs."""

import json

from tests.conftest import TEST_DATA, require_reference

from svjedi_tpu.io.fasta import read_fasta
from svjedi_tpu.graph.svparse import parse_vcf_svs
from svjedi_tpu.graph.build import (
    build_graph,
    write_gfa,
    write_ignored_svs,
    write_svs_edges_json,
)


def _build(tmp_path):
    require_reference()
    chroms = read_fasta(TEST_DATA / "reference_genome.fasta")
    parsed = parse_vcf_svs(
        TEST_DATA / "test.vcf", {c: len(s) for c, s in chroms.items()}
    )
    graph = build_graph(chroms, parsed)
    return chroms, parsed, graph


def test_gfa_byte_parity(tmp_path, ref_artifacts):
    _, parsed, graph = _build(tmp_path)
    write_gfa(graph, tmp_path / "ours.gfa")
    ours = (tmp_path / "ours.gfa").read_bytes()
    theirs = (ref_artifacts / "test.gfa").read_bytes()
    assert ours == theirs


def test_svs_edges_byte_parity(tmp_path, ref_artifacts):
    _, parsed, graph = _build(tmp_path)
    write_svs_edges_json(graph, tmp_path / "ours.json")
    ours = (tmp_path / "ours.json").read_bytes()
    theirs = (ref_artifacts / "test_svs_edges.json").read_bytes()
    assert ours == theirs


def test_ignored_svs_parity(tmp_path, ref_artifacts):
    _, parsed, graph = _build(tmp_path)
    write_ignored_svs(parsed, tmp_path / "ignored.txt")
    ours = (tmp_path / "ignored.txt").read_bytes()
    theirs = (ref_artifacts / "test_ignored_svs.txt").read_bytes()
    assert ours == theirs


def test_link_tags_cover_all_svs(tmp_path):
    _, parsed, graph = _build(tmp_path)
    tagged = {tag for tags in graph.link_tags.values() for tag, _ in tags}
    # Every non-discarded SV must be reachable through at least one tagged
    # link under its record-chromosome lookup key.
    for rec in parsed.svs:
        assert f"{rec.chrom}:{rec.sv_id}" in tagged


def test_edge_json_loadable_as_reference_schema(tmp_path):
    _, parsed, graph = _build(tmp_path)
    write_svs_edges_json(graph, tmp_path / "edges.json")
    data = json.loads((tmp_path / "edges.json").read_text())
    for key, tags in data.items():
        assert len(key.split("@")) == 4
        for tag, allele in tags:
            assert allele in (0, 1)
            assert ":" in tag
