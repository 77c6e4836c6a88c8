#!/usr/bin/env python3
"""Mechanical bench-drift adjudicator.

The box's throughput drifts 25-46% within a session (SCALE.md), so a
cross-round bench comparison cannot distinguish a code regression from
machine drift by the suite numbers alone. This tool makes the call the
way the round-13 manual A/Bs did, mechanically:

  1. diff two bench JSONs (the engine's own format — scalar medians under
     "queries", or the driver's [value, ...] arrays) and list the queries
     that crossed the regression threshold (ratio AND absolute floor);
  2. check out BOTH commits into throwaway git worktrees and re-run just
     the crossed queries at each, in fresh forked JVMs (run/fork := true),
     on the CURRENT box state — same machine weather for both sides;
  3. verdict per query: if the fresh A/B on identical box state still
     shows the regression (ratio > sqrt(threshold), splitting the noise
     band), it is CODE; otherwise the original crossing was DRIFT.

Usage:
  tools/bench_ab.py OLD.json NEW.json --old-commit <sha> [--new-commit HEAD]
      [--threshold 1.3] [--abs-floor 0.8] [--sf-dir /root/testdata/sf0.1]
      [--iters 3] [--warmup 1] [--out target/bench_ab.json] [--list-only]

Exit code: 0 = no code regressions (all crossings drift / none), 1 = at
least one CODE verdict, 2 = usage/infrastructure error.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile


def load_times(path):
    """Per-query seconds from either bench JSON shape."""
    with open(path) as f:
        doc = json.load(f)
    qs = doc.get("queries", doc)
    out = {}
    for name, v in qs.items():
        if isinstance(v, (int, float)):
            out[name] = float(v)
        elif isinstance(v, list) and v and isinstance(v[0], (int, float)):
            out[name] = float(v[0])
    return out


def crossings(old, new, threshold, abs_floor):
    """Queries slower in `new` by more than ratio AND absolute floor."""
    out = {}
    for q, t_new in new.items():
        t_old = old.get(q)
        if t_old is None or t_old <= 0:
            continue
        if t_new / t_old > threshold and (t_new - t_old) > abs_floor:
            out[q] = (t_old, t_new)
    return out


def run(cmd, cwd=None, env=None):
    p = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True, text=True)
    if p.returncode != 0:
        sys.stderr.write(p.stdout[-4000:] + "\n" + p.stderr[-4000:] + "\n")
        raise RuntimeError(f"command failed: {' '.join(cmd)}")
    return p.stdout


def worktree_for(commit, repo):
    """A throwaway worktree at `commit` (reused if already created)."""
    sha = run(["git", "rev-parse", commit], cwd=repo).strip()
    wt = os.path.join(tempfile.gettempdir(), f"bench_ab_{sha[:12]}")
    if not os.path.isdir(os.path.join(wt, ".git")) and not os.path.isfile(
            os.path.join(wt, ".git")):
        run(["git", "worktree", "add", "--detach", wt, sha], cwd=repo)
    return sha, wt


def bench_at(wt, queries, sf_dir, iters, warmup, jvm_reps):
    """Filtered Bench runs in the worktree across `jvm_reps` fresh JVMs;
    per-query MIN across JVMs (the standard noise-floor estimator — JIT
    and allocator luck only ever ADD time, so min isolates the plan)."""
    out_json = os.path.join(wt, "target", "bench_ab_run.json")
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_BENCH_ITERS": str(iters),
        "SPARK_GRAFT_BENCH_WARMUP": str(warmup),
        "SPARK_GRAFT_BENCH_OUT": out_json,
    })
    best = {}
    for _ in range(max(1, jvm_reps)):
        run(["sbt", "-batch", "runMain graft.Bench " + " ".join(queries)],
            cwd=wt, env=env)
        for q, t in load_times(out_json).items():
            best[q] = min(best.get(q, float("inf")), t)
    return best


def explain_outlier(query, sf_dir, iters, warmup, out_path):
    """Re-run ONE query `iters` times in ONE JVM with per-iteration wall
    times and GC-time deltas (SPARK_GRAFT_BENCH_TIMES), then attribute a
    max-only outlier mechanically:
      - gc:   the outlier iteration's GC delta exceeds the median
              iteration's by more than half of the extra wall time;
      - jit:  the outlier is the FIRST timed iteration (warm-up ran, but
              lazily-reached code paths still compile there);
      - none: max within 1.5x of median — there is no outlier to explain;
      - unexplained: an isolated spike with no GC/JIT signature (box
              weather: scheduler stall, page cache, a neighbour).
    """
    repo = run(["git", "rev-parse", "--show-toplevel"]).strip()
    out_json = os.path.join(repo, "target", "bench_explain_run.json")
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_BENCH_ITERS": str(iters),
        "SPARK_GRAFT_BENCH_WARMUP": str(warmup),
        "SPARK_GRAFT_BENCH_OUT": out_json,
        "SPARK_GRAFT_BENCH_TIMES": "1",
    })
    run(["sbt", "-batch", "runMain graft.Bench " + query], cwd=repo, env=env)
    with open(out_json) as f:
        doc = json.load(f)
    times = doc.get("times", {})
    gcs = doc.get("gc_ms", {})
    if len(times) != 1:
        sys.stderr.write(f"--explain-outlier must select exactly one "
                         f"query; '{query}' matched {sorted(times)}\n")
        return 2
    name = next(iter(times))
    ts, gs = times[name], gcs.get(name, [0] * len(times[name]))
    srt = sorted(ts)
    med = srt[len(srt) // 2]
    mx = max(ts)
    i_max = ts.index(mx)
    med_gc = sorted(gs)[len(gs) // 2]
    extra_wall_ms = (mx - med) * 1000.0
    extra_gc_ms = gs[i_max] - med_gc
    if mx <= 1.5 * med:
        verdict = "none"
    elif extra_gc_ms > 0.5 * extra_wall_ms:
        verdict = "gc"
    elif i_max == 0:
        verdict = "jit"
    else:
        verdict = "unexplained"
    report = {
        "query": name, "iters": iters, "times_s": [round(t, 3) for t in ts],
        "gc_ms": gs, "median_s": round(med, 3), "max_s": round(mx, 3),
        "max_iteration": i_max, "extra_wall_ms": round(extra_wall_ms, 1),
        "extra_gc_ms_vs_median": extra_gc_ms, "verdict": verdict,
    }
    print(json.dumps(report, indent=2))
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {out_path}")
    return 0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old_json", nargs="?")
    ap.add_argument("new_json", nargs="?")
    ap.add_argument("--old-commit",
                    help="commit the OLD json was measured at (required "
                         "for A/B mode)")
    ap.add_argument("--new-commit", default="HEAD")
    ap.add_argument("--threshold", type=float, default=1.3)
    ap.add_argument("--abs-floor", type=float, default=0.8,
                    help="seconds of absolute slowdown below which a "
                         "crossing is ignored")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--jvm-reps", type=int, default=2,
                    help="fresh JVMs per commit; per-query min across "
                         "them (sub-3s queries swing 2x+ across JVMs on "
                         "identical code — SCALE.md)")
    ap.add_argument("--out", default="target/bench_ab.json")
    ap.add_argument("--list-only", action="store_true",
                    help="print the crossings and exit (no re-runs)")
    ap.add_argument("--explain-outlier", metavar="QUERY",
                    help="re-run ONE query --iters times in one JVM with "
                         "per-iteration wall+GC times and attribute a "
                         "max-only outlier (gc / jit / unexplained); "
                         "ignores the json/commit arguments")
    args = ap.parse_args()

    if args.explain_outlier:
        return explain_outlier(args.explain_outlier, args.sf_dir,
                               max(args.iters, 8), args.warmup,
                               args.out if args.out != "target/bench_ab.json"
                               else "target/bench_explain.json")
    if not args.old_json or not args.new_json or not args.old_commit:
        sys.stderr.write("old_json, new_json and --old-commit are required "
                         "unless --explain-outlier is used\n")
        return 2

    repo = run(["git", "rev-parse", "--show-toplevel"]).strip()
    old = load_times(args.old_json)
    new = load_times(args.new_json)
    crossed = crossings(old, new, args.threshold, args.abs_floor)
    if not crossed:
        print("no crossings: nothing to adjudicate")
        return 0
    print(f"{len(crossed)} crossing(s) at ratio>{args.threshold} "
          f"and delta>{args.abs_floor}s:")
    for q, (a, b) in sorted(crossed.items()):
        print(f"  {q}: {a:.2f}s -> {b:.2f}s ({b / a:.2f}x)")
    if args.list_only:
        return 0

    names = sorted(crossed)
    sha_old, wt_old = worktree_for(args.old_commit, repo)
    sha_new, wt_new = worktree_for(args.new_commit, repo)
    print(f"A/B on current box state: {sha_old[:12]} vs {sha_new[:12]}")
    t_old = bench_at(wt_old, names, args.sf_dir, args.iters, args.warmup,
                     args.jvm_reps)
    t_new = bench_at(wt_new, names, args.sf_dir, args.iters, args.warmup,
                     args.jvm_reps)

    # the noise band is split: a genuine code regression should reproduce
    # most of its original ratio; sqrt(threshold) marks "more than half
    # of it (in log space) is still there on identical box state"
    bar = args.threshold ** 0.5
    verdicts = {}
    for q in names:
        a, b = t_old.get(q), t_new.get(q)
        if a is None or b is None or a <= 0:
            verdicts[q] = {"verdict": "error", "old_s": a, "new_s": b}
            continue
        verdicts[q] = {
            "verdict": "code" if b / a > bar else "drift",
            "recorded_old_s": crossed[q][0], "recorded_new_s": crossed[q][1],
            "ab_old_s": round(a, 3), "ab_new_s": round(b, 3),
            "ab_ratio": round(b / a, 3), "bar": round(bar, 3),
        }
        print(f"  {q}: A/B {a:.2f}s -> {b:.2f}s "
              f"({b / a:.2f}x, bar {bar:.2f}) => {verdicts[q]['verdict']}")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"old_commit": sha_old, "new_commit": sha_new,
                   "threshold": args.threshold, "abs_floor": args.abs_floor,
                   "sf_dir": args.sf_dir, "verdicts": verdicts}, f, indent=2)
    print(f"wrote {args.out}")
    return 1 if any(v["verdict"] == "code" for v in verdicts.values()) else 0


if __name__ == "__main__":
    sys.exit(main())
