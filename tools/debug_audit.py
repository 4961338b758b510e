"""Characterize audit re-score deficits (the compute_winner_stats warning).

For every winner whose summed piece re-score falls below the chain score
by more than the slack, print its geometry: spans, strand, owned SV sizes
on the winning path, and the largest |indel| the alignment implies
(qspan - tspan mismatch), to test the hypothesis that deficits are
SV-spanning alignments whose true diagonal steps away from the linear
interpolation by more than the doubled band.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

from debug_cluster import build_state  # noqa: E402

from svjedi_tpu.align.pipeline import compute_winner_stats  # noqa: E402


def main():
    st = build_state()
    cfg, panel, winners, reads = (
        st["cfg"], st["panel"], st["winners"], st["reads"]
    )
    compute_winner_stats(reads, panel, winners, cfg.align)
    qspan = (winners.qe - winners.qs + 1).astype(np.int64)
    tspan = (winners.te - winners.ts + 1).astype(np.int64)
    slack = 64 * np.maximum(1, (qspan + cfg.align.block_rows - 1)
                            // cfg.align.block_rows)
    bad = np.flatnonzero(winners.rescore_deficit > slack)
    print(f"{len(bad)} deficit winners / {len(winners.read)} total "
          f"(band={cfg.align.band}, piece={cfg.align.block_rows})")
    for wi in bad:
        p = panel.paths[int(winners.path[wi])]
        svs = [(t, a) for (t, a, j, *_) in p.owned]
        print(
            f"read={int(winners.read[wi]):>4} path={int(winners.path[wi])}"
            f" strand={int(winners.strand[wi])}"
            f" score={int(winners.score[wi])}"
            f" deficit={int(winners.rescore_deficit[wi])}"
            f" q=[{int(winners.qs[wi])},{int(winners.qe[wi])}]"
            f" t=[{int(winners.ts[wi])},{int(winners.te[wi])}]"
            f" qspan-tspan={int(qspan[wi] - tspan[wi])}"
            f" identity={winners.matches[wi] / max(1, winners.blocklen[wi]):.3f}"
            f" owned={svs}"
        )


if __name__ == "__main__":
    main()
