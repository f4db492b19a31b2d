#!/usr/bin/env python3
"""Round-over-round bench regression gate on the STABLE axes (round-10
verdict #7): wall-clock on a shared box swings ±40%, so adjudicating on it
burned an arbiter A/B cycle three rounds running. BENCH_DETAIL.json records
per-query {wall_s, cpu_s, shuffle_mb}; this tool diffs two such records and
flags queries whose cpu_s or shuffle_mb moved more than THRESH (default
20%), emitting BENCH_DELTA.json — a machine-checked list the verdict can
cite instead of re-running arbiters.

Usage: bench_delta.py PREV.json CUR.json [OUT.json] [--thresh 0.20]

Notes on the axes:
- cpu_s is executor CPU from the stage listener — a few % run-to-run.
- shuffle_mb is shuffle WRITE bytes — deterministic for a fixed plan and
  input (AQE can re-plan, so small drift is possible; a >20% move means
  the plan or the data volume actually changed).
- wall_s rides along for context but NEVER flags.
- Queries present in only one record are listed as added/removed, not
  flagged (new operators are expected every round).
- A floor (default 1.0 cpu_s / 5.0 shuffle_mb on the BASE side) keeps
  sub-second queries from flagging on jitter: 0.3 s -> 0.4 s is +33% and
  pure noise.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d.get("queries", {})


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thresh = 0.20
    for a in sys.argv[1:]:
        if a.startswith("--thresh"):
            thresh = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    if len(args) < 2:
        sys.exit(__doc__)
    prev_path, cur_path = args[0], args[1]
    out_path = args[2] if len(args) > 2 else "BENCH_DELTA.json"
    prev, cur = load(prev_path), load(cur_path)

    cpu_floor, shuf_floor = 1.0, 5.0
    flagged, rows = [], {}
    for q in sorted(set(prev) | set(cur)):
        if q not in prev:
            rows[q] = {"status": "added"}
            continue
        if q not in cur:
            rows[q] = {"status": "removed"}
            continue
        p, c = prev[q], cur[q]
        row = {"status": "ok"}
        reasons = []
        for axis, floor in (("cpu_s", cpu_floor), ("shuffle_mb", shuf_floor)):
            pv, cv = p.get(axis, 0.0), c.get(axis, 0.0)
            row[axis] = {"prev": pv, "cur": cv}
            if pv >= floor or cv >= floor:
                delta = (cv - pv) / max(pv, floor)
                row[axis]["delta_pct"] = round(100 * delta, 1)
                if abs(delta) > thresh:
                    reasons.append(f"{axis} {'+' if delta > 0 else ''}{100 * delta:.0f}%")
        row["wall_s"] = {"prev": p.get("wall_s"), "cur": c.get("wall_s")}  # context only
        if reasons:
            row["status"] = "flagged"
            row["reasons"] = reasons
            flagged.append(q)
        rows[q] = row

    out = {
        "metric": "bench_delta",
        "prev": prev_path,
        "cur": cur_path,
        "thresh_pct": round(100 * thresh),
        "flagged": flagged,
        "queries": rows,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[bench_delta] {len(flagged)} flagged of {len(rows)} queries "
          f"(thresh {100 * thresh:.0f}% on cpu_s/shuffle_mb) -> {out_path}")
    for q in flagged:
        print(f"  {q}: {', '.join(rows[q]['reasons'])}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
