"""Per-record attribution of the residual count-parity extras.

For every record whose raw crossing counts exceed the golden
expected_genotype.vcf, list EVERY crossing read with its alignment
observables (identity, mapq, junction margins, score density, decoy
margins, audit re-score deficit), and compare the weakest delta-N
candidates against the "must-keep floor" — the minimum of each
observable over crossings at RECORDS THAT ALREADY MATCH golden (cutting
any of those creates an under-count). If an extra candidate sits above
the floor on every observable, no alignment-side threshold can remove it
without collateral damage: the discrepancy is a minigraph-internal
per-read mapping decision, not recoverable from our geometry.

Writes the markdown table to stdout (redirect into PARITY.md's
attribution section).
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

from debug_cluster import build_state  # noqa: E402
from debug_parity import golden_raw_counts  # noqa: E402

from svjedi_tpu.align.pipeline import compute_winner_stats  # noqa: E402


def crossings(panel, winners, d_over, min_density=0.0):
    """(tag, allele) -> list of dicts, one per counted crossing, with the
    same dedup/exclusivity/density rules as count_support."""
    contrib = {}
    span = np.maximum(1, winners.te - winners.ts + 1)
    dense_ok = winners.score >= min_density * span
    for i in range(len(winners.read)):
        if not dense_ok[i]:
            continue
        path = panel.paths[int(winners.path[i])]
        ts, te = int(winners.ts[i]), int(winners.te[i])
        for tag, allele, j, li in path.owned:
            if (j - ts) >= d_over and (te - j + 1) >= d_over:
                contrib.setdefault((int(winners.read[i]), tag), []).append(
                    (int(winners.score[i]), i, li, allele, j)
                )
    out = {}
    for (read_id, tag), rows in contrib.items():
        if len({a for (_, _, _, a, _) in rows}) > 1:
            best = max(s for (s, _, _, _, _) in rows)
            best_i = min(i for (s, i, _, _, _) in rows if s == best)
            keepa = next(a for (s, i, _, a, _) in rows if i == best_i)
            rows = [r for r in rows if r[3] == keepa]
        seen = set()
        for score, i, li, allele, j in rows:
            if (li, allele) in seen:
                continue
            seen.add((li, allele))
            ts, te = int(winners.ts[i]), int(winners.te[i])
            ident = float(winners.matches[i]) / max(1, int(winners.blocklen[i]))
            out.setdefault((tag, allele), []).append(dict(
                read=read_id, row=i,
                identity=round(ident, 3),
                mapq=int(winners.mapq[i]),
                margin=min(j - ts, te - j + 1),
                dens=round(float(winners.score[i])
                           / max(1, te - ts + 1), 3),
                deficit=int(winners.rescore_deficit[i]),
            ))
    return out


def main():
    st = build_state()
    cfg, panel, winners, reads = (
        st["cfg"], st["panel"], st["winners"], st["reads"]
    )
    compute_winner_stats(reads, panel, winners, cfg.align)
    gold = golden_raw_counts()
    cross = crossings(panel, winners, cfg.genotype.d_over,
                      min_density=cfg.genotype.min_count_density)
    ours = {}
    for (tag, allele), rows in cross.items():
        pair = ours.setdefault(tag, [0, 0])
        pair[allele] += len(rows)

    # Must-keep floor: observables over crossings at records already
    # matching golden byte-for-byte.
    floor_rows = []
    for tag, g in gold.items():
        o = tuple(ours.get(tag, (0, 0)))
        if o == g:
            for allele in (0, 1):
                floor_rows += cross.get((tag, allele), [])
    keys = ("identity", "mapq", "margin", "dens")
    floor = {k: min(r[k] for r in floor_rows) for k in keys}
    print(f"Must-keep floor over {len(floor_rows)} crossings at the 24 "
          f"byte-matching records: "
          + " ".join(f"{k}>={floor[k]}" for k in keys))
    print()
    print("| record | allele | delta | weakest crossing reads "
          "(read: identity/mapq/margin/density/deficit) | separable? |")
    print("|---|---|---|---|---|")
    for tag in sorted(gold):
        g = gold[tag]
        o = tuple(ours.get(tag, (0, 0)))
        if o == g:
            continue
        for allele in (0, 1):
            d = o[allele] - g[allele]
            if d <= 0:
                continue
            rows = sorted(cross.get((tag, allele), []),
                          key=lambda r: (r["identity"], r["mapq"]))
            weakest = rows[: max(d, 2)]
            cells = []
            sep = []
            for r in weakest:
                cells.append(
                    f"{r['read']}: {r['identity']}/{r['mapq']}"
                    f"/{r['margin']}/{r['dens']}/{r['deficit']}"
                )
                below = [k for k in keys if r[k] < floor[k]]
                sep.append("+".join(below) if below else "no")
            print(f"| {tag} | {'alt' if allele else 'ref'} | +{d} | "
                  + "; ".join(cells) + " | " + "; ".join(sep) + " |")


if __name__ == "__main__":
    main()
