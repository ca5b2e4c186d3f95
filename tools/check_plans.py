#!/usr/bin/env python3
"""Plan-regression gate (r13, VERDICT r12 item 7): compare per-query
plan FINGERPRINTS between the committed PLANS.md and a freshly
generated one, and fail on un-annotated growth.

A fingerprint is the scale-relevant shape of a plan, not its text
(expression ids churn every run):
  - shuffles:   count of ShuffleExchange nodes ("Exchange hash/range/...")
  - broadcasts: count of BroadcastExchange nodes
  - sorts:      count of Sort nodes (excluding TakeOrdered)
  - expands:    count of Expand nodes (the layout_column_stats lesson)
  - windows:    count of Window exec nodes
  - pushdown:   whether any scan carries a non-empty PushedFilters
  - readschema: whether any FileScan prunes columns (ReadSchema present)

Failure policy:
  - a query whose shuffles/sorts/expands/windows GREW vs the committed
    file fails the gate (plan regressed without PLANS.md being
    regenerated + reviewed);
  - pushdown present -> absent fails (a filter stopped reaching a scan);
  - key-set drift (query added/removed without regenerating) fails;
  - SHRINK only warns: an improvement, but the committed file is stale
    — regenerate it.

Usage: check_plans.py COMMITTED.md FRESH.md
"""
import re
import sys


def parse(path):
    """{query: fingerprint dict} from a PLANS.md file."""
    text = open(path, encoding="utf-8").read()
    out = {}
    # sections: "## name\n\n```\n<plan>\n```"
    for m in re.finditer(r"^## (\S+)\n+```\n(.*?)\n```", text, re.M | re.S):
        name, plan = m.group(1), m.group(2)
        out[name] = fingerprint(plan)
    return out


def fingerprint(plan):
    lines = plan.splitlines()
    def count(pred):
        return sum(1 for ln in lines if pred(ln.strip()))
    def node(ln):
        # strip tree-drawing prefix to the operator name
        return re.sub(r"^[:+\-| ]*", "", ln)
    return {
        "shuffles": count(lambda l: node(l).startswith("Exchange ")),
        "broadcasts": count(lambda l: node(l).startswith("BroadcastExchange")),
        "sorts": count(lambda l: node(l).startswith("Sort ")),
        "expands": count(lambda l: node(l).startswith("Expand")),
        "windows": count(lambda l: node(l).startswith("Window ")
                         or node(l).startswith("RunningWindowFunction")),
        "pushdown": re.search(r"PushedFilters: \[[^\]]", plan) is not None,
        "readschema": "ReadSchema:" in plan,
    }


GROW_FAIL = ["shuffles", "sorts", "expands", "windows"]


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    committed, fresh = parse(sys.argv[1]), parse(sys.argv[2])
    fails, warns = [], []
    if set(committed) != set(fresh):
        added = sorted(set(fresh) - set(committed))
        removed = sorted(set(committed) - set(fresh))
        fails.append(f"key drift vs committed PLANS.md: added={added} "
                     f"removed={removed} — regenerate PLANS.md")
    for q in sorted(set(committed) & set(fresh)):
        old, new = committed[q], fresh[q]
        for k in GROW_FAIL:
            if new[k] > old[k]:
                fails.append(f"{q}: {k} grew {old[k]} -> {new[k]}")
            elif new[k] < old[k]:
                warns.append(f"{q}: {k} shrank {old[k]} -> {new[k]} "
                             f"(improvement — regenerate PLANS.md)")
        if old["pushdown"] and not new["pushdown"]:
            fails.append(f"{q}: PushedFilters disappeared from every scan")
    for w in warns:
        print(f"WARN  {w}")
    for f in fails:
        print(f"FAIL  {f}")
    n = len(set(committed) & set(fresh))
    print(f"== plan gate: {n} fingerprints compared, "
          f"{len(fails)} fail, {len(warns)} warn ==")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
