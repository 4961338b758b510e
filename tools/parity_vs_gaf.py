#!/usr/bin/env python3
"""Mechanical count-parity closure against an external (minigraph) GAF.

The residual count gap vs the reference (20 extra crossings out of ~900,
PARITY.md) is blocked on a minigraph run this environment cannot provide
(no binary, no egress). This tool makes closure MECHANICAL the day a
minigraph GAF exists: one command turns it into a per-read keep/drop
worklist —

    python tools/parity_vs_gaf.py \
        --gaf minigraph_output.gaf \
        --vcf /root/reference/test-dir/test.vcf \
        --ref /root/reference/test-dir/reference_genome.fasta \
        --ours out_informative_aln.json \
        [-o worklist.tsv]

It rebuilds the variation graph, runs the REFERENCE filter semantics
(filter-alignments.py:90-175, via genotype/filter_gaf.py — link + reverse
link probe, d_over=100 both-sides path-space rule) over the GAF, and
diffs the resulting per-(SV, allele) read sets against ours (the audit
JSON a pipeline run writes). Output TSV, one row per disagreeing read:

    sv_tag  allele  read  direction  detail

``direction`` is EXTRA (we count it, the GAF filter does not → candidate
over-count) or MISSING (the GAF filter counts it, we do not → candidate
under-count). The EXTRA rows are the closure worklist; PARITY.md's
attribution table explains why no global rule removes them blindly.

Self-test stand-in (tests/test_parity_vs_gaf.py): our own ``--gaf``
export re-filtered through this tool — not count-parity-exact by design
(align/gaf_out.py caveat: per-cluster records double-count shared
flanks on naive re-filtering), but it exercises the full path and pins
the diff format.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from typing import Dict, List, Set, Tuple

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def read_sets_from_informative(
    informative: Dict[str, List[List[str]]],
) -> Dict[Tuple[str, int], Set[str]]:
    """(sv_tag, allele) -> set of read names, from an audit table.

    Both our pipeline's ``*_informative_aln.json`` and the reference's
    have the same schema: tag -> [[ref GAF-like lines], [alt lines]];
    column 1 of each line is the read name (filter-alignments.py:163-166).
    """
    out: Dict[Tuple[str, int], Set[str]] = {}
    for tag, pair in informative.items():
        for allele in (0, 1):
            reads = {line.split("\t")[0] for line in pair[allele]}
            if reads:
                out[(tag, allele)] = reads
    return out


def filter_external_gaf(
    gaf_path, vcf_path, ref_path, d_over: int = 100
) -> Dict[str, List[List[str]]]:
    """Run the reference filter semantics over an external GAF.

    Rebuilds the graph from (vcf, ref) — byte-parity with the reference
    builder is separately certified (tests/test_graph_parity.py) — and
    probes each GAF record's links against the edge->SV map exactly as
    filter-alignments.py does.
    """
    from svjedi_tpu.genotype.filter_gaf import filter_gaf_records
    from svjedi_tpu.graph.build import build_graph
    from svjedi_tpu.graph.svparse import parse_vcf_svs
    from svjedi_tpu.io.fasta import read_fasta
    from svjedi_tpu.io.gaf import read_gaf

    chroms = read_fasta(ref_path)
    parsed = parse_vcf_svs(vcf_path, {c: len(s) for c, s in chroms.items()})
    graph = build_graph(chroms, parsed)
    link_tags = graph.link_tags
    alt_len = {
        n.name: n.length for n in graph.nodes if n.is_alt
    }
    return filter_gaf_records(
        read_gaf(gaf_path), link_tags, alt_len, d_over=d_over
    )


def diff_read_sets(
    ours: Dict[Tuple[str, int], Set[str]],
    gaf: Dict[Tuple[str, int], Set[str]],
) -> List[Tuple[str, int, str, str]]:
    """Rows (sv_tag, allele, read, direction) for every disagreement."""
    rows: List[Tuple[str, int, str, str]] = []
    keys = sorted(set(ours) | set(gaf))
    for key in keys:
        tag, allele = key
        o = ours.get(key, set())
        g = gaf.get(key, set())
        for read in sorted(o - g):
            rows.append((tag, allele, read, "EXTRA"))
        for read in sorted(g - o):
            rows.append((tag, allele, read, "MISSING"))
    return rows


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--gaf", required=True,
                    help="external GAF (e.g. minigraph output on our GFA)")
    ap.add_argument("--vcf", required=True)
    ap.add_argument("--ref", required=True)
    ap.add_argument("--ours", required=True,
                    help="our pipeline's <prefix>_informative_aln.json")
    ap.add_argument("-o", "--output", default="-",
                    help="worklist TSV (default stdout)")
    ap.add_argument("--dover", type=int, default=100)
    args = ap.parse_args(argv)

    with open(args.ours) as fh:
        ours_tbl = json.load(fh)
    ours = read_sets_from_informative(ours_tbl)
    gaf_tbl = filter_external_gaf(
        args.gaf, args.vcf, args.ref, d_over=args.dover
    )
    gaf = read_sets_from_informative(gaf_tbl)
    rows = diff_read_sets(ours, gaf)

    out = sys.stdout if args.output == "-" else open(args.output, "w")
    try:
        out.write("sv_tag\tallele\tread\tdirection\n")
        for tag, allele, read, direction in rows:
            out.write(f"{tag}\t{allele}\t{read}\t{direction}\n")
    finally:
        if out is not sys.stdout:
            out.close()

    n_extra = sum(1 for r in rows if r[3] == "EXTRA")
    n_missing = sum(1 for r in rows if r[3] == "MISSING")
    agree = sum(
        len(ours.get(k, set()) & gaf.get(k, set()))
        for k in set(ours) | set(gaf)
    )
    print(
        f"[parity_vs_gaf] agree={agree} extra={n_extra} "
        f"missing={n_missing} (extra = our crossings the GAF filter "
        "lacks; missing = under-counts to fix first)",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
