"""Panel enumeration: cluster structure and walk semantics on test-dir."""

import numpy as np

from tests.conftest import TEST_DATA, require_reference

from svjedi_tpu.config import AlignConfig
from svjedi_tpu.graph.build import FWD, REV, build_graph
from svjedi_tpu.graph.cluster import build_panel
from svjedi_tpu.graph.svparse import parse_vcf_svs
from svjedi_tpu.io.fasta import read_fasta


def _panel():
    require_reference()
    cfg = AlignConfig()
    chroms = read_fasta(TEST_DATA / "reference_genome.fasta")
    parsed = parse_vcf_svs(
        TEST_DATA / "test.vcf", {c: len(s) for c, s in chroms.items()}
    )
    graph = build_graph(chroms, parsed)
    panel = build_panel(graph, flank=cfg.flank, cluster_gap=cfg.cluster_gap)
    return graph, panel, parsed


def _cluster_tags(graph, panel, cid):
    cluster = panel.clusters[cid]
    return {
        t for li in cluster.link_indices for t, _ in graph.links[li].tags
    }


def test_every_sv_covered_by_some_cluster():
    graph, panel, parsed = _panel()
    covered = set()
    for cluster in panel.clusters:
        for li in cluster.link_indices:
            for tag, _ in graph.links[li].tags:
                covered.add(tag)
    for rec in parsed.svs:
        assert f"{rec.chrom}:{rec.sv_id}" in covered


def test_each_tagged_link_owned_once():
    graph, panel, _ = _panel()
    seen = {}
    for cluster in panel.clusters:
        for li in cluster.link_indices:
            assert li not in seen, "link owned by two clusters"
            seen[li] = cluster.cluster_id


def test_no_truncated_clusters_on_testdir():
    _, panel, _ = _panel()
    assert not any(c.truncated for c in panel.clusters)


def test_del_cluster_has_ref_and_alt_paths():
    graph, panel, _ = _panel()
    for cluster in panel.clusters:
        tags = _cluster_tags(graph, panel, cluster.cluster_id)
        if tags == {"1:DEL-10000-10500"}:
            alleles = set()
            for pi in cluster.paths:
                for tag, allele, *_ in panel.paths[pi].owned:
                    alleles.add(allele)
            assert alleles == {0, 1}
            return
    raise AssertionError("isolated DEL cluster not found")


def test_nested_inv_produces_reverse_walk():
    """INV-33000-36000 contains INV-33800-34100; the big INV's alt walk must
    traverse interior nodes in reverse orientation."""
    graph, panel, _ = _panel()
    for cluster in panel.clusters:
        tags = _cluster_tags(graph, panel, cluster.cluster_id)
        if "1:INV-33000-36000" in tags:
            has_reverse_interior = False
            for pi in cluster.paths:
                path = panel.paths[pi]
                if any(a == 1 for _, a, *_ in path.owned):
                    if any(s == REV for _, s in path.states):
                        has_reverse_interior = True
            assert has_reverse_interior
            return
    raise AssertionError("nested INV cluster not found")


def test_multi_ins_shared_breakpoint_branches():
    """Two INS at the same position form one cluster with ref + both alt
    branches; taking one INS node crosses neither of the other's edges."""
    graph, panel, _ = _panel()
    for cluster in panel.clusters:
        tags = _cluster_tags(graph, panel, cluster.cluster_id)
        if "2:INS-10000-1" in tags:
            assert "2:INS-10000-2" in tags
            per_path_tags = []
            for pi in cluster.paths:
                crossed = {
                    (t, a) for t, a, *_ in panel.paths[pi].owned
                }
                per_path_tags.append(crossed)
            # One path supports INS-1 alt without touching INS-2 alt.
            assert any(
                ("2:INS-10000-1", 1) in s and ("2:INS-10000-2", 1) not in s
                for s in per_path_tags
            )
            # The ref path supports allele 0 of both.
            assert any(
                ("2:INS-10000-1", 0) in s and ("2:INS-10000-2", 0) in s
                for s in per_path_tags
            )
            return
    raise AssertionError("multi-INS cluster not found")


def test_junction_offsets_match_sequence_boundaries():
    """Junction offsets must sit exactly at node boundaries in the trimmed
    sequence: the base before offset J is the last base of the left node."""
    graph, panel, _ = _panel()
    from svjedi_tpu.graph.cluster import oriented_codes

    cache = {}
    for path in panel.paths[:20]:
        # Rebuild untrimmed walk sequence and check length bookkeeping.
        chunks = [oriented_codes(graph, cache, s) for s in path.states]
        full = np.concatenate(chunks)
        assert path.full_len == len(full)
        trim_right = path.trim_left + len(path.seq)
        np.testing.assert_array_equal(
            full[path.trim_left : trim_right], path.seq
        )
        for tag, allele, j, *_ in path.owned:
            assert 0 <= j <= len(path.seq)
