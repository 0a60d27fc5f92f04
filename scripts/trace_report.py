"""Summarize a jax.profiler trace.json.gz: per-op device durations with HLO
long names, grouped and sorted.  Device durations are truthful even where
the axon tunnel memoizes repeat dispatches (CLAUDE.md).

Usage: python scripts/trace_report.py /tmp/bliss_prof_refit_samp [n_calls]
n_calls divides the summed durations (default 3 — the profiled loops run 3
dispatches).
"""
import collections
import glob
import gzip
import json
import sys


def load_events(root: str):
    paths = glob.glob(f"{root}/plugins/profile/*/*.trace.json.gz")
    assert paths, f"no trace under {root}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        return json.load(f)["traceEvents"]


def main():
    root = sys.argv[1]
    n_calls = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    ev = load_events(root)
    durs = collections.defaultdict(float)
    names = {}
    cats = collections.defaultdict(float)
    for e in ev:
        if e.get("ph") != "X":
            continue
        a = e.get("args", {})
        if "hlo_category" not in a:
            continue
        n = e.get("name", "")
        durs[n] += e["dur"]
        cats[a["hlo_category"]] += e["dur"]
        if n not in names:
            names[n] = a.get("long_name", "")
    total = sum(durs.values())
    print(f"device total: {total / n_calls / 1e3:.1f} ms/call over "
          f"{n_calls} calls")
    print("\n-- categories --")
    for c in sorted(cats, key=lambda k: -cats[k]):
        print(f"{cats[c] / n_calls / 1e3:8.2f} ms  {c}")
    print("\n-- top ops --")
    for n in sorted(durs, key=lambda k: -durs[k])[:60]:
        ln = names[n].replace("\n", " ")[:170]
        print(f"{durs[n] / n_calls / 1e3:8.2f} ms  {n:<28s} {ln}")


if __name__ == "__main__":
    main()
