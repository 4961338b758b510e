"""Compare per-SV allele counts between the current platform and a saved set.

Usage:
  JAX_PLATFORMS=cpu python tools/debug_tpu_counts.py save /tmp/counts_cpu.json
  python tools/debug_tpu_counts.py diff /tmp/counts_cpu.json
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from svjedi_tpu.align.index import build_panel_index
from svjedi_tpu.align.pipeline import align_and_count
from svjedi_tpu.config import AlignConfig, GenotypeConfig
from svjedi_tpu.graph.build import build_graph
from svjedi_tpu.graph.cluster import build_panel
from svjedi_tpu.graph.svparse import parse_vcf_svs
from svjedi_tpu.io.fasta import read_fasta
from svjedi_tpu.io.fastq import read_reads

TEST_DIR = Path("/root/reference/test-dir")


def compute():
    cfg = AlignConfig()
    gcfg = GenotypeConfig()
    chroms = read_fasta(TEST_DIR / "reference_genome.fasta")
    parsed = parse_vcf_svs(TEST_DIR / "test.vcf", {c: len(s) for c, s in chroms.items()})
    graph = build_graph(chroms, parsed)
    panel = build_panel(graph, flank=cfg.flank, cluster_gap=cfg.cluster_gap,
                        max_paths_per_cluster=cfg.max_paths_per_cluster)
    index = build_panel_index(panel, k=cfg.kmer, w=cfg.window,
                              max_hits_per_minimizer=cfg.max_hits_per_minimizer)
    reads = read_reads(str(TEST_DIR / "simulated_reads.fastq.gz"))
    counts, _, _ = align_and_count(reads, panel, index, cfg, gcfg, collect_audit=False)
    return {k: list(v) for k, v in counts.items()}


def main():
    mode, path = sys.argv[1], sys.argv[2]
    counts = compute()
    if mode == "save":
        Path(path).write_text(json.dumps(counts, indent=0, sort_keys=True))
        print(f"saved {len(counts)} SVs")
    else:
        ref = json.loads(Path(path).read_text())
        ndiff = 0
        for k in sorted(set(counts) | set(ref)):
            a, b = counts.get(k), ref.get(k)
            if a != b:
                print(f"{k}: here={a} saved={b}")
                ndiff += 1
        print(f"{ndiff} SVs differ")


if __name__ == "__main__":
    main()
