"""List every winner on a cluster (by tag substring) with spans and truth."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from debug_cluster import build_state, read_truth  # noqa: E402


def main():
    tag_sub = sys.argv[1]
    st = build_state()
    panel, winners, reads = st["panel"], st["winners"], st["reads"]
    truth = read_truth(reads)

    cids = set()
    for ci, cl in enumerate(panel.clusters):
        for pi in cl.paths:
            if any(tag_sub in t for (t, a, j, *_) in panel.paths[pi].owned):
                cids.add(ci)
    print(f"clusters {sorted(cids)}")
    rows = []
    for i in range(len(winners.read)):
        if int(winners.cluster[i]) not in cids:
            continue
        p = panel.paths[int(winners.path[i])]
        rid = int(winners.read[i])
        tc, tp, tl = truth[rid]
        rows.append(
            (
                int(winners.ts[i]),
                f"read {rid:>4} path={int(winners.path[i])} "
                f"strand={int(winners.strand[i])} score={int(winners.score[i])} "
                f"q=[{int(winners.qs[i])},{int(winners.qe[i])}] "
                f"t=[{int(winners.ts[i])},{int(winners.te[i])}] "
                f"truth={tc}:{tp}+{tl}",
            )
        )
    for _, r in sorted(rows):
        print(r)


if __name__ == "__main__":
    main()
