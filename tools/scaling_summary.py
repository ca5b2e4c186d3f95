#!/usr/bin/env python3
"""Build BENCH_sf1.json / BENCH_sf10.json scaling summaries from the
per-query battery artifacts (all measured at one source tree).

Usage: python3 tools/scaling_summary.py
"""
import json, statistics


def load(p):
    d = json.load(open(p))
    return d["value"], d["queries"]


def summarize(lo_tot, lo_q, hi_tot, hi_q, n_top=8):
    ratios = {k: hi_q[k] / lo_q[k] for k in hi_q if k in lo_q and lo_q[k] > 0}
    rs = sorted(ratios.values())
    top = sorted(ratios.items(), key=lambda kv: -kv[1])[:n_top]
    return {
        "total_sec": round(hi_tot, 1),
        "n_queries": len(hi_q),
        "sec_per_query": round(hi_tot / len(hi_q), 3),
        "base_total_sec_same_tree": round(lo_tot, 1),
        "suite_ratio_at_10x_data": round(hi_tot / lo_tot, 2),
        "median_per_query_ratio": round(statistics.median(rs), 2),
        "queries_at_most_3x": sum(1 for r in rs if r <= 3),
        "queries_over_10x": [
            {"query": k, "ratio": round(r, 1)} for k, r in top if r > 10],
        "top_ratios": [
            {"query": k, "ratio": round(r, 1),
             "base_sec": round(lo_q[k], 3), "sec": round(hi_q[k], 3)}
            for k, r in top],
    }


s01s_t, s01s = load("BENCH_FULL_shared.json")
s01i_t, s01i = load("BENCH_FULL_isolate.json")
s1s_t, s1s = load("BENCH_sf1_FULL_shared.json")
s1i_t, s1i = load("BENCH_sf1_FULL_isolate.json")

sf1 = {
    "metric": "sf1 scaling evidence (re-measured at the final r17 tree)",
    "sf1_dir": ".testdata-sf1 (deterministic 10x scale-up of sf0.1 via tools/gen_sf1.py)",
    "tree": "src-r17-final - sf0.1, sf1, AND sf10, both modes, one tree (tools/bench_battery.sh)",
    "cpus": 32,
    "unit": "sec",
    "shared": summarize(s01s_t, s01s, s1s_t, s1s),
    "isolate": summarize(s01i_t, s01i, s1i_t, s1i),
}
json.dump(sf1, open("BENCH_sf1.json", "w"), indent=1)
print("BENCH_sf1.json:", sf1["shared"]["suite_ratio_at_10x_data"], "/",
      sf1["isolate"]["suite_ratio_at_10x_data"])

s10s_t, s10s = load("BENCH_sf10_FULL_shared.json")
sf10 = {
    "metric": "sf10 scaling evidence (r16 verdict item 3 - the third measured decade)",
    "sf10_dir": ".testdata-sf10 (deterministic 100x scale-up of sf0.1 via tools/gen_sf1.py REPL=100, 2.4 GB, 60M lineitem)",
    "tree": "src-r17-final - same tree as BENCH_sf1.json and the sf0.1 final pair",
    "cpus": 32,
    "unit": "sec",
    "shared": summarize(s1s_t, s1s, s10s_t, s10s, n_top=10),
}
try:
    s10i_t, s10i = load("BENCH_sf10_FULL_isolate.json")
    sf10["isolate"] = summarize(s1i_t, s1i, s10i_t, s10i, n_top=10)
except FileNotFoundError:
    pass
json.dump(sf10, open("BENCH_sf10.json", "w"), indent=1)
print("BENCH_sf10.json:", sf10["shared"]["suite_ratio_at_10x_data"],
      "/", sf10.get("isolate", {}).get("suite_ratio_at_10x_data", "pending"))
