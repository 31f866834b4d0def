#!/usr/bin/env python3
"""Self-baseline bench gate: compare a bench JSON line against the previous
round's BENCH_r{N}.json and flag per-query regressions.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
      2>/dev/null | grep -F '"metric"' > /tmp/bench_new.json
  python3 tools/bench_compare.py BENCH_r03.json /tmp/bench_new.json

Exit 1 if any overlapping query regressed more than REGRESSION_FACTOR
(ignoring sub-second noise), or if a previously-passing query now errors.
"""
import json
import os
import sys

REGRESSION_FACTOR = 2.0
NOISE_FLOOR_SEC = 1.0  # both under this -> jitter, not signal


def load(path):
    # Accepted shapes: the raw one-line Bench output (possibly behind sbt's
    # "[info] " prefix) or the driver's BENCH_r{N}.json wrapper, whose
    # "parsed" field holds the same object.
    with open(path) as f:
        text = f.read()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "queries" in doc:
            return doc
        if isinstance(doc, dict) and isinstance(doc.get("parsed"), dict):
            return doc["parsed"]
        if isinstance(doc, dict) and isinstance(doc.get("tail"), str):
            text = doc["tail"]  # salvage from the truncated tail below
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        if '"metric"' in line and "{" in line:
            return json.loads(line[line.index("{"):])
    # Last resort: the driver's wrapper truncates "tail" to 2 kB, cutting
    # the JSON line mid-object — salvage whatever per-query pairs survived.
    import re
    if '"metric"' in text:
        seg = text[text.index('"metric"'):]
        queries = {m.group(1): float(m.group(2)) for m in
                   re.finditer(r'"([a-z0-9_]+)":([0-9]+\.[0-9]+)', seg)
                   if m.group(1) not in ("value",)}
        total = re.search(r'"value":([0-9.]+)', seg)
        if queries:
            return {"value": float(total.group(1)) if total else 0.0,
                    "queries": queries, "errors": {},
                    "_partial": True}
    raise SystemExit(f"no bench JSON line found in {path}")


def main():
    base_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r03.json"
    new_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_new.json"
    base, new = load(base_path), load(new_path)
    bq, nq = base["queries"], new["queries"]

    bsb, nsb = base.get("shuffle_bytes", {}), new.get("shuffle_bytes", {})

    def contention_plausible(name):
        # Per-query shuffle bytes are deterministic for an unchanged plan;
        # a wall-time blowup WITHOUT a shuffle change is the signature of
        # machine contention, not a code regression (round-9 lesson).
        # Guards against masking a genuine COMPUTE-bound regression:
        #   - a zero-shuffle query (broadcast/map-only) carries no signal
        #     in its shuffle bytes, so it gets no escape hatch;
        #   - a recorded loadavg near-idle at run end contradicts the
        #     contention claim.
        if name not in bsb or name not in nsb:
            return False
        b, n = bsb[name], nsb[name]
        if max(b, n) == 0:
            return False
        la = new.get("loadavg")
        # threshold scales with the box THE RUN HAPPENED ON: prefer the
        # cpus recorded in the artifact (Bench emits "cpus" since r11);
        # os.cpu_count() of the comparing machine is only the legacy
        # fallback for older artifacts.
        min_busy = max(4.0, 0.125 * (new.get("cpus") or os.cpu_count() or 32))
        if la and la[0] < min_busy:
            return False
        return abs(n - b) <= 0.02 * max(b, n)

    # Canonicality: Bench stamps "canonical" from its own starting loadavg
    # (1-min AND 5-min below the record-run threshold). A non-canonical
    # record was taken on a busy host, so a slower number is not evidence
    # of a code regression — such findings are reported but never fail the
    # gate; the fix is a re-run on an idle box, not a code hunt. Older
    # artifacts without the flag keep the legacy (trusting) behavior.
    new_canonical = new.get("canonical", True)
    base_canonical = base.get("canonical", True)
    comparable = new_canonical and base_canonical

    regressions, contention, noncanonical, improved, errors = [], [], [], [], []
    for name in sorted(set(bq) & set(nq)):
        b, n = bq[name], nq[name]
        if max(b, n) < NOISE_FLOOR_SEC:
            continue
        if n > b * REGRESSION_FACTOR:
            # A slowdown is a FAILURE unless the NEW run itself was
            # taken under load: exceeding 2x even an inflated baseline is
            # stronger evidence of regression, not weaker — only the
            # new-run-noncanonical direction justifies refusal.
            bucket = (contention if contention_plausible(name)
                      else regressions if new_canonical else noncanonical)
            bucket.append((name, b, n))
        elif b > n * REGRESSION_FACTOR:
            # an inflated baseline fabricates wins exactly as it masks
            # regressions — demote both when the pair is not comparable
            (improved if comparable else noncanonical).append((name, b, n))
    for name in sorted(set(bq) - set(nq)):
        if name in new.get("errors", {}):
            errors.append((name, new["errors"][name]))

    print(f"baseline total {base['value']:.1f}s ({len(bq)} queries) -> "
          f"new total {new['value']:.1f}s ({len(nq)} queries)")
    for la in (new.get("loadavg"),):
        if la:
            print(f"new-run loadavg at exit: {la}")
    for name, b, n in improved:
        print(f"IMPROVED  {name}: {b:.2f}s -> {n:.2f}s")
    for name, b, n in regressions:
        print(f"REGRESSED {name}: {b:.2f}s -> {n:.2f}s (>{REGRESSION_FACTOR}x)")
    for name, b, n in contention:
        print(f"CONTENTION {name}: {b:.2f}s -> {n:.2f}s but shuffle bytes "
              f"unchanged — ambient load, not code; re-run on an idle box: "
              f'sbt -batch "runMain graft.Bench {name}"')
    if not comparable:
        side = ("record" if not new_canonical else "BASELINE")
        info = (new if not new_canonical else base).get('loadavg_start')
        effect = ("REGRESSED verdicts refused" if not new_canonical
                  else "IMPROVED lines demoted (an inflated baseline "
                       "fabricates wins; slowdowns vs it still FAIL)")
        print(f"NONCANONICAL {side}: loadavg_start {info} exceeded the "
              f"record-run threshold — {effect}; re-run when 1-min and "
              f"5-min loadavg settle")
    for name, b, n in noncanonical:
        print(f"NONCANONICAL-SUSPECT {name}: {b:.2f}s -> {n:.2f}s "
              f"(not a verdict: the artifacts are not comparable — see "
              f"the NONCANONICAL line for which side to re-record)")
    for name, msg in errors:
        print(f"ERROR     {name}: was {bq[name]:.2f}s, now fails: {msg[:120]}")
    if not regressions and not errors:
        print("OK: no per-query regression beyond "
              f"{REGRESSION_FACTOR}x (noise floor {NOISE_FLOOR_SEC}s)"
              + (f"; {len(contention)} contention-suspect(s), not failures"
                 if contention else "")
              + (f"; {len(noncanonical)} noncanonical-suspect(s), re-run idle"
                 if noncanonical else ""))
    sys.exit(1 if regressions or errors else 0)


if __name__ == "__main__":
    main()
