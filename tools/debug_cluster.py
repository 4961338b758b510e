"""Deep-dive one or more SV tags: panel paths, winners, per-junction counts.

Caches the aligned winners in /tmp/dbg_winners.npz so repeated inspection
doesn't re-run the DP.
"""
import os
import pickle
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from svjedi_tpu.config import PipelineConfig
from svjedi_tpu.graph.build import build_graph, REV
from svjedi_tpu.graph.svparse import parse_vcf_svs
from svjedi_tpu.graph.cluster import build_panel
from svjedi_tpu.align.index import build_panel_index
from svjedi_tpu.align.pipeline import align_and_count
from svjedi_tpu.io.fasta import read_fasta
from svjedi_tpu.io.fastq import read_reads

TESTDIR = "/root/reference/test-dir"
CACHE = "/tmp/dbg_state.pkl"


def build_state(force=False):
    if os.path.exists(CACHE) and not force:
        with open(CACHE, "rb") as fh:
            return pickle.load(fh)
    cfg = PipelineConfig(
        vcf=f"{TESTDIR}/test.vcf",
        ref=f"{TESTDIR}/reference_genome.fasta",
        reads=(f"{TESTDIR}/simulated_reads.fastq.gz",),
        prefix="/tmp/dbg",
    )
    chroms = read_fasta(cfg.ref)
    chrom_lengths = {c: len(s) for c, s in chroms.items()}
    parsed = parse_vcf_svs(cfg.vcf, chrom_lengths)
    graph = build_graph(chroms, parsed)
    panel = build_panel(
        graph,
        flank=cfg.align.flank,
        cluster_gap=cfg.align.cluster_gap,
        max_paths_per_cluster=cfg.align.max_paths_per_cluster,
        max_hops_per_path=cfg.align.max_hops_per_path,
    )
    index = build_panel_index(
        panel, k=cfg.align.kmer, w=cfg.align.window,
        max_hits_per_minimizer=cfg.align.max_hits_per_minimizer,
    )
    reads = read_reads(list(cfg.reads))
    decoy = None
    if cfg.align.decoy and os.environ.get("SVJT_NO_DECOY") != "1":
        from svjedi_tpu.align.decoy import build_decoy

        decoy = build_decoy(
            panel, k=cfg.align.kmer, w=cfg.align.window,
            max_hits_per_minimizer=cfg.align.max_hits_per_minimizer,
        )
    counts, audit, winners = align_and_count(
        reads, panel, index, cfg.align, cfg.genotype, collect_audit=False,
        decoy=decoy,
    )
    state = dict(cfg=cfg, panel=panel, index=index, reads=reads,
                 counts=counts, winners=winners)
    with open(CACHE, "wb") as fh:
        pickle.dump(state, fh)
    return state


def read_truth(reads):
    """Parse startpos/chromosome from raw FASTQ headers (names are truncated
    at whitespace by the reader, like the reference's loader)."""
    import gzip

    out = []
    with gzip.open(f"{TESTDIR}/simulated_reads.fastq.gz", "rt") as fh:
        for i, line in enumerate(fh):
            if i % 4 != 0:
                continue
            meta = dict(
                kv.split("=", 1) for kv in line.strip().split(" ", 1)[1].split(";")
            )
            out.append((meta["chromosome"], int(meta["startpos"]),
                        int(meta["length"].rstrip("bp"))))
    return out


def main():
    force = "--force" in sys.argv
    want = [a for a in sys.argv[1:] if not a.startswith("--")]
    st = build_state(force)
    panel, winners, reads = st["panel"], st["winners"], st["reads"]
    graph = panel.graph
    truth = read_truth(reads)

    # tags -> clusters
    tag_clusters = {}
    for ci, cl in enumerate(panel.clusters):
        for pi in cl.paths:
            for tag, allele, j, *_ in panel.paths[pi].owned:
                tag_clusters.setdefault(tag, set()).add(ci)

    for tag_sub in want:
        tags = [t for t in tag_clusters if tag_sub in t]
        for tag in tags:
            print(f"=== tag {tag} clusters={sorted(tag_clusters[tag])}")
            for ci in sorted(tag_clusters[tag]):
                cl = panel.clusters[ci]
                print(f"  cluster {ci} truncated={cl.truncated} paths={len(cl.paths)}")
                for pi in cl.paths:
                    p = panel.paths[pi]
                    walk = ",".join(
                        ("<" if s == REV else ">") + graph.nodes[n].name
                        for (n, s) in p.states
                    )
                    print(f"    path {pi} len={p.length} owned={p.owned}")
                    print(f"       walk {walk}")
            # winners on these clusters and their junction counts
            per_j = {}
            for i in range(len(winners.read)):
                if int(winners.cluster[i]) not in tag_clusters[tag]:
                    continue
                p = panel.paths[int(winners.path[i])]
                ts, te = int(winners.ts[i]), int(winners.te[i])
                rid = int(winners.read[i])
                for t2, allele, j, *_ in p.owned:
                    if t2 != tag:
                        continue
                    hit = (j - ts) >= 100 and (te - j + 1) >= 100
                    if hit:
                        per_j.setdefault((int(winners.path[i]), j, allele), []).append(rid)
            print(f"  counted per (path, junction, allele):")
            for key in sorted(per_j):
                rids = per_j[key]
                print(f"    path={key[0]} j={key[1]} allele={key[2]} n={len(rids)}")
                for rid in rids:
                    tc, tp, tl = truth[rid]
                    print(f"       read {rid} ({reads.names[rid].split(' ')[0]}) "
                          f"truth chrom={tc} start={tp} len={tl}")


if __name__ == "__main__":
    main()
