#!/usr/bin/env python3
"""Interleaved same-session A/B bench: the structural fix for host drift.

Two canonical full-suite runs taken on DIFFERENT days differ ~8% in
median per-query wall with byte-identical shuffles (r14→r15 record), so
cross-day per-query deltas are unadjudicable. This harness removes the
day: given two git SHAs it builds both (worktrees under /tmp), waits for
an idle host ONCE, then alternates suite runs A,B,A,B,… in one session
and emits ONE paired artifact — per-query minima side by side, ratios,
and every sub-run's canonical/SHA stamp for verification.

Usage:
  python3 tools/bench_ab.py SHA_A SHA_B [--sf /root/testdata/sf0.1]
      [--rounds 2] [--queries q1,q2,...] [--out BENCH_AB.json]
      [--label-a NAME] [--label-b NAME]

Conventions:
  - A is the BASELINE (older code), B the candidate. ratio = b/a.
  - Each sub-run is graft.Bench itself (its own 2-timed-runs-min per
    query, noop-write materialization, contention rerun guard), so a
    paired cell is min over (rounds × 2) full executions per side.
  - Run order MIRRORS between rounds (A,B then B,A then A,B …): a
    monotonic within-session drift (cache warmth, thermal, tenant load
    ramping) hits each side first and second equally often — plain
    alternation systematically biases against whichever side runs
    second in every pair (measured: +9% uniform on the second side
    across 204 queries with ZERO shuffle-byte deltas).
  - A cooldown before every sub-run waits for the PREVIOUS run's load
    to drain (l1 back under the gate, bounded wait): without it, every
    run after the first inherits the prior suite's loadavg and stamps
    canonical:false structurally rather than meaningfully.
  - The artifact is canonical only if EVERY sub-run stamped canonical
    (each Bench JVM re-reads loadavg at its own start).
"""
import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd, cwd=REPO, env=None, capture=True):
    r = subprocess.run(cmd, cwd=cwd, env=env,
                       capture_output=capture, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"{' '.join(cmd)} failed in {cwd}:\n"
                           f"{(r.stdout or '')[-2000:]}\n{(r.stderr or '')[-2000:]}")
    return (r.stdout or "").strip()


def resolve(sha):
    return sh(["git", "rev-parse", "--short=12", sha])


def worktree_for(sha):
    """Detached worktree at the SHA (reused only when verifiably still AT
    the SHA and clean — a stale or locally-edited worktree would silently
    bench the wrong code)."""
    full = sh(["git", "rev-parse", sha])
    head = sh(["git", "rev-parse", "HEAD"])
    dirty = sh(["git", "status", "--porcelain", "--", "src", "build.sbt"])
    if full == head and not dirty:
        return REPO  # measuring the repo's own clean HEAD: no copy needed
    path = f"/tmp/graft_ab_{resolve(sha)}"
    if os.path.isdir(path):
        try:
            at_sha = sh(["git", "rev-parse", "HEAD"], cwd=path) == full
            clean = not sh(["git", "status", "--porcelain",
                            "--", "src", "build.sbt"], cwd=path)
            if at_sha and clean:
                return path
        except RuntimeError:
            pass
        print(f"[bench_ab] stale/dirty worktree at {path}; recreating",
              flush=True)
        subprocess.run(["git", "worktree", "remove", "--force", path],
                       cwd=REPO, capture_output=True)
        subprocess.run(["rm", "-rf", path], capture_output=True)
    sh(["git", "worktree", "add", "--detach", path, sha])
    return path


def compile_side(path):
    print(f"[bench_ab] compiling {path} …", flush=True)
    sh(["sbt", "-batch", "compile"], cwd=path, capture=True)


def loadavg():
    with open("/proc/loadavg") as f:
        return [float(x) for x in f.read().split()[:3]]


def wait_idle(l1_max=0.7, l5_max=1.2, timeout_s=1800):
    """Stricter than Canonical's 2.0: sbt/JVM startup adds ~0.5-1.0
    between this check and Bench.main reading /proc/loadavg."""
    t0 = time.time()
    while True:
        l = loadavg()
        if l[0] < l1_max and l[1] < l5_max:
            return l
        if time.time() - t0 > timeout_s:
            print(f"[bench_ab] WARNING: host never idled ({l}); proceeding "
                  f"— artifact will stamp canonical:false", flush=True)
            return l
        print(f"[bench_ab] waiting for idle host: {l}", flush=True)
        time.sleep(30)


def run_bench(path, sf, queries, tag):
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf
    env["SPARK_GRAFT_BENCH_OUT"] = f"/tmp/graft_ab_out_{tag}.json"
    args = ["sbt", "-batch",
            "runMain graft.Bench" + ("" if not queries else " " + " ".join(queries))]
    print(f"[bench_ab] run {tag}: {path}", flush=True)
    out = subprocess.run(args, cwd=path, env=env, capture_output=True,
                         text=True)
    line = None
    for ln in (out.stdout or "").splitlines():
        if '"metric"' in ln and '"queries"' in ln:
            line = ln[ln.index('{'):]
    if line is None:
        raise RuntimeError(f"no bench JSON from {tag}:\n"
                           f"{(out.stdout or '')[-3000:]}\n{(out.stderr or '')[-2000:]}")
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sha_a")
    ap.add_argument("sha_b")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--queries", default="")
    ap.add_argument("--out", default="BENCH_AB.json")
    ap.add_argument("--label-a", default="")
    ap.add_argument("--label-b", default="")
    args = ap.parse_args()
    queries = [q for q in args.queries.split(",") if q]

    sha_a, sha_b = resolve(args.sha_a), resolve(args.sha_b)
    side_a, side_b = worktree_for(args.sha_a), worktree_for(args.sha_b)
    # Compile BOTH before the idle wait: compilation is the noisy part.
    compile_side(side_a)
    compile_side(side_b)

    gate = wait_idle()
    runs_a, runs_b = [], []
    order = []
    for r in range(args.rounds):
        pair = [("a", side_a, runs_a), ("b", side_b, runs_b)]
        if r % 2 == 1:
            pair.reverse()  # mirror: each side runs first equally often
        for tag, side, sink in pair:
            if order:  # drain the previous run's load before the next
                wait_idle(l1_max=1.2, l5_max=4.0, timeout_s=240)
            sink.append(run_bench(side, args.sf, queries, f"{tag}{r}"))
            order.append(f"{tag}{r}")

    def best(runs, key):
        per = {}
        for run in runs:
            for q, v in run.get(key, {}).items():
                per[q] = min(per[q], v) if q in per else v
        return per

    qa, qb = best(runs_a, "queries"), best(runs_b, "queries")
    sa, sb = best(runs_a, "shuffle_bytes"), best(runs_b, "shuffle_bytes")
    names = sorted(set(qa) & set(qb))
    pairs = {q: {"a": qa[q], "b": qb[q],
                 "ratio": round(qb[q] / qa[q], 4) if qa[q] > 0 else None}
             for q in names}
    shuffle = {q: {"a": sa.get(q), "b": sb.get(q)} for q in names}
    ratios = [p["ratio"] for p in pairs.values() if p["ratio"]]
    canonical = all(r.get("canonical") for r in runs_a + runs_b)
    artifact = {
        "harness": "bench_ab", "sf": args.sf, "rounds": args.rounds,
        "sha_a": sha_a, "sha_b": sha_b,
        "label_a": args.label_a or sha_a, "label_b": args.label_b or sha_b,
        "canonical": canonical, "loadavg_gate": gate, "run_order": order,
        "run_stamps": [{"side": s, "git_sha": r.get("git_sha"),
                        "canonical": r.get("canonical"),
                        "loadavg_start": r.get("loadavg_start"),
                        "total": r.get("value")}
                       for s, rs in (("a", runs_a), ("b", runs_b))
                       for r in rs],
        "median_ratio": round(statistics.median(ratios), 4) if ratios else None,
        "total_a": round(sum(qa[q] for q in names), 2),
        "total_b": round(sum(qb[q] for q in names), 2),
        "queries": pairs, "shuffle_bytes": shuffle,
        "errors_a": {k: v for r in runs_a for k, v in r.get("errors", {}).items()},
        "errors_b": {k: v for r in runs_b for k, v in r.get("errors", {}).items()},
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: artifact[k] for k in
                      ("sha_a", "sha_b", "canonical", "median_ratio",
                       "total_a", "total_b")}))
    worst = sorted(((p["ratio"], q) for q, p in pairs.items()
                    if p["ratio"]), reverse=True)[:8]
    for ratio, q in worst:
        print(f"  {q}: {pairs[q]['a']:.2f} -> {pairs[q]['b']:.2f} "
              f"({ratio:.2f}x)")


if __name__ == "__main__":
    main()
