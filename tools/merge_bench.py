# Dev-only: merge N full-bench JSON lines (one per pass) into the
# bench_full record shape — per-key times across passes plus a summary
# whose per-query values are the cross-pass minima (the host-IO-variance
# protocol from BASELINE.md: only per-query minima across >=2 runs are
# comparable).
import json, sys

out = sys.argv[1]
runs = [json.load(open(p)) for p in sys.argv[2:]]
keys = sorted(runs[0]["queries"])
passes = {k: [round(r["queries"][k], 4) for r in runs] for k in keys}
best = {k: min(passes[k]) for k in keys}
summary = dict(runs[0])
summary["queries"] = best
summary["value"] = round(sum(best.values()), 9)
# a flag stands only if EVERY pass reported it (min-of-passes still
# over the floor); any pass under the floor clears the key
standing = set(runs[0].get("regressions_vs_ref", {}))
for r in runs[1:]:
    standing &= set(r.get("regressions_vs_ref", {}))
summary["regressions_vs_ref"] = {
    k: min(r["regressions_vs_ref"][k] for r in runs) for k in sorted(standing)}
summary["first_pass_flags"] = runs[0].get("first_pass_flags", {})
json.dump({"summary": summary, "passes": passes}, open(out, "w"), indent=1)
print("total(min-of-passes):", summary["value"], "keys:", len(keys))
for k in keys:
    if max(passes[k]) > 1.5 * min(passes[k]) and max(passes[k]) > 0.5:
        print("variance>1.5x:", k, passes[k])
