#!/usr/bin/env python3
"""Compare two bench artifacts (bench.json / BENCH_rN.json shape).

Usage: python3 tools/bench_compare.py OLD.json NEW.json [ratio_flag]

Prints common-row totals, the movers beyond the flag ratio (default 1.3x)
in both directions, added/removed rows, and — when the artifacts carry the
round-12 protocol fields — the calibration-canary readings and any
self-heal interventions, so a mover can be adjudicated (host band vs plan
regression vs protocol artifact) from the two records alone.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    # the driver's BENCH_rN.json wrapper: {n, rc, sf, tail, parsed}. Since
    # round 14 the parsed line is the COMPACT summary (totals + top10, full
    # map in bench.json), so always merge: tail-salvaged rows (the truncated
    # full artifact line precedes the compact one in the capture window)
    # under whatever the parsed record carries.
    if "parsed" in d or "tail" in d:
        import re
        salvaged = {k: float(v) for k, v in
                    re.findall(r'"(q\d+_[a-z0-9_]+)":(-?\d+(?:\.\d+)?)',
                               d.get("tail", ""))}
        p = d.get("parsed") or {}
        qmap = salvaged
        qmap.update(p.get("queries") or p.get("top10") or {})
        d = dict(p)
        d["queries"] = qmap
    q = {k: v for k, v in d.get("queries", {}).items() if v is not None and v >= 0}
    return d, q


def main(old_path, new_path, flag=1.3):
    do, qo = load(old_path)
    dn, qn = load(new_path)
    common = sorted(set(qo) & set(qn))
    to = sum(qo[k] for k in common)
    tn = sum(qn[k] for k in common)
    print(f"common rows: {len(common)}  old={to:.1f}s  new={tn:.1f}s  "
          f"ratio={tn / to:.3f}" if to else "no common rows")
    for name, rows in (("added", sorted(set(qn) - set(qo))),
                       ("removed", sorted(set(qo) - set(qn)))):
        if rows:
            print(f"{name} ({len(rows)}): {', '.join(rows)}")

    movers = []
    for k in common:
        if qo[k] <= 0:
            continue
        r = qn[k] / qo[k]
        if r > flag or r < 1 / flag:
            movers.append((r, k))
    for r, k in sorted(movers, reverse=True):
        diag = dn.get("diag", {}).get(k, {})
        extra = ""
        if diag:
            w = diag.get("freshWarm", diag.get("warm"))
            extra = f"  [sweep={diag.get('sweep')}, warm={w:.2f}s" if w else ""
            if diag.get("warmSkipped"):
                extra += f", warm=prior({diag.get('prior', -1):.2f}s)" if not extra else ", warmSkipped"
            if "lateMedian" in diag and "mainMedian" in diag:
                extra += (f", LATE-RERUN {diag['mainMedian']:.2f}->"
                          f"{diag['lateMedian']:.2f}s")
            if "healMedian" in diag:
                extra += (f", HEALED {diag['mainMedian']:.2f}->"
                          f"{diag['healMedian']:.2f}s")
            ps = diag.get("passes")
            if ps and len(ps) >= 2 and ps[0] > ps[-1] * 1.3:
                extra += ", warming-staircase " + "->".join(f"{p:.2f}" for p in ps)
            if extra:
                extra += "]"
        print(f"  mover {k}: {qo[k]:.2f}s -> {qn[k]:.2f}s ({r:.2f}x){extra}")
    if not movers:
        print(f"  no movers beyond {flag}x")

    for label, d in (("old", do), ("new", dn)):
        can = d.get("canary")
        if can:
            print(f"canary {label}: " +
                  " ".join(f"{k}={v:.2f}s" for k, v in can.items()))
    healed = [k for k, v in dn.get("diag", {}).items() if "healMedian" in v]
    if healed:
        print(f"self-heal interventions in new: {', '.join(sorted(healed))}")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 1.3)
