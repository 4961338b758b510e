"""Profile align_and_count host-side to find where dp_s time goes."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/svjt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
from pathlib import Path
from svjedi_tpu.align.index import build_panel_index
from svjedi_tpu.align.pipeline import align_and_count
from svjedi_tpu.config import AlignConfig, GenotypeConfig
from svjedi_tpu.graph.build import build_graph
from svjedi_tpu.graph.cluster import build_panel
from svjedi_tpu.graph.svparse import parse_vcf_svs
from svjedi_tpu.io.fasta import read_fasta
from svjedi_tpu.io.fastq import ReadSet, read_reads

TEST_DIR = Path("/root/reference/test-dir")
align_cfg = AlignConfig()
genotype_cfg = GenotypeConfig()
chroms = read_fasta(TEST_DIR / "reference_genome.fasta")
parsed = parse_vcf_svs(TEST_DIR / "test.vcf", {c: len(s) for c, s in chroms.items()})
graph = build_graph(chroms, parsed)
panel = build_panel(graph, flank=align_cfg.flank, cluster_gap=align_cfg.cluster_gap,
                    max_paths_per_cluster=align_cfg.max_paths_per_cluster)
index = build_panel_index(panel, k=align_cfg.kmer, w=align_cfg.window,
                          max_hits_per_minimizer=align_cfg.max_hits_per_minimizer)
base = read_reads(str(TEST_DIR / "simulated_reads.fastq.gz"))
REPS = 10
reps = ReadSet(
    names=[f"{n}/{r}" for r in range(REPS) for n in base.names],
    codes=np.tile(base.codes, REPS),
    offsets=np.concatenate(
        [base.offsets[:-1] + r * base.codes.size for r in range(REPS)]
        + [np.array([base.codes.size * REPS])]),
)
# warm
t = {}
align_and_count(base, panel, index, align_cfg, genotype_cfg, collect_audit=False, timings=t)
print("warm:", t, file=sys.stderr)

import cProfile, pstats
t = {}
pr = cProfile.Profile()
pr.enable()
align_and_count(reps, panel, index, align_cfg, genotype_cfg, collect_audit=False, timings=t)
pr.disable()
print("timings:", t, file=sys.stderr)
st = pstats.Stats(pr)
st.sort_stats("cumulative").print_stats(30)
