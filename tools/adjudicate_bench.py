#!/usr/bin/env python3
"""Merge fresh-JVM adjudication evidence into a bench artifact.

Usage: adjudicate_bench.py FULL.json MULTI.json TIMEQUERY_LOG

Reads the unadjudicated lines of FULL.json (the one-line full artifact),
takes each line's fresh-JVM min-of-3 from a TimeQuery log (one forked
`runMain graft.cli.TimeQuery <name> <dir> 3` per name, concatenated), and
rewrites both artifact files with: rerun[name] gaining
fresh/fresh_adjudicated, steady capped, adjudicated=true; the headline
queries[name] = min(first, rerun, fresh); total recomputed;
unadjudicated emptied of the patched names. The same one-sided rule Bench
itself applies: a fresh fork can only OVERSTATE plan cost, so min() is
always evidence. Bench now runs this sweep itself
(SPARK_GRAFT_FRESH_UNADJ_MAX); this tool retrofits an already-produced
artifact without re-running the whole suite.
"""
import json
import re
import sys


def fmt(v):
    return f"{v:.3f}"


def qjson(pairs):
    return "{" + ",".join(f'"{k}":{fmt(v)}' for k, v in pairs) + "}"


def parse_timequery_log(path):
    """name -> min rep seconds. Keys off EITHER invocation marker: sbt's
    'running (fork) graft.cli.TimeQuery <name> …' echo, or TimeQuery's own
    'timequery <name> @ <dir>' header (present since r16 — a plain-java
    invocation like Bench.freshJvmMin emits no sbt echo; ADVICE r15)."""
    mins = {}
    current = None
    run_res = [re.compile(r"running \(fork\) graft\.cli\.TimeQuery ([a-z0-9_]+) "),
               re.compile(r"^timequery ([a-z0-9_]+) @ ")]
    rep_re = re.compile(r"rep \d+: ([0-9.]+) s")
    for line in open(path):
        m = next((m for r in run_res if (m := r.search(line))), None)
        if m:
            current = m.group(1)
            continue
        m = rep_re.search(line)
        if m and current:
            v = float(m.group(1))
            mins[current] = min(mins.get(current, v), v)
    return mins


def render_full(d):
    parts = [
        f'"metric":"total"', f'"value":{fmt(d["value"])}', '"unit":"sec"',
        f'"queries":{qjson(d["queries"].items())}', f'"sf":"{d["sf"]}"',
        f'"n_queries":{d["n_queries"]}',
        '"errors":' + json.dumps(d["errors"], separators=(",", ":")),
        f'"load":{{"start":{fmt(d["load"]["start"])},"end":{fmt(d["load"]["end"])},"cpus":{d["load"]["cpus"]}}}',
        '"rerun":' + render_rerun(d["rerun"]),
        '"load_contaminated":' + json.dumps(d["load_contaminated"], separators=(",", ":")),
        '"unadjudicated":' + json.dumps(d["unadjudicated"], separators=(",", ":")),
        '"memo_rebuilds":' + json.dumps(d.get("memo_rebuilds", {}),
                                        separators=(",", ":"), sort_keys=True),
        f'"rerun_load_gate":{fmt(d["rerun_load_gate"])}',
        f'"data_warm":{str(d["data_warm"]).lower()}',
        f'"jvm":{{"code_cache_used_mb":{d["jvm"]["code_cache_used_mb"]},"code_cache_max_mb":{d["jvm"]["code_cache_max_mb"]},"gc_sec":{fmt(d["jvm"]["gc_sec"])}}}',
        f'"query_load":{qjson(d["query_load"].items())}',
    ]
    return "{" + ",".join(parts) + "}"


def render_rerun(rr):
    out = []
    for name, x in rr.items():
        fields = [f'"first":{fmt(x["first"])}', f'"rerun":{fmt(x["rerun"])}',
                  f'"steady":{fmt(x["steady"])}']
        if x.get("fresh") is not None and x.get("fresh", -1) > 0:
            fields.append(f'"fresh":{fmt(x["fresh"])}')
        if x.get("fresh_adjudicated"):
            fields.append('"fresh_adjudicated":true')
        if x.get("rebuilt_stages"):
            fields.append('"rebuilt_stages":true')
        fields += [f'"rerun_ok":{str(x["rerun_ok"]).lower()}',
                   f'"rerun_load":{fmt(x["rerun_load"])}',
                   f'"adjudicated":{str(x["adjudicated"]).lower()}']
        out.append(f'"{name}":{{' + ",".join(fields) + "}")
    return "{" + ",".join(out) + "}"


def render_detail(d):
    slowest = sorted(d["queries"].items(), key=lambda kv: -kv[1])[:25]
    adj = (f'"rerun":{render_rerun(d["rerun"])},'
           f'"load_contaminated":{json.dumps(d["load_contaminated"], separators=(",", ":"))},'
           f'"unadjudicated":{json.dumps(d["unadjudicated"], separators=(",", ":"))},'
           f'"memo_rebuilds":{json.dumps(d.get("memo_rebuilds", {}), separators=(",", ":"), sort_keys=True)},'
           f'"rerun_load_gate":{fmt(d["rerun_load_gate"])},'
           f'"data_warm":{str(d["data_warm"]).lower()},'
           f'"jvm":{{"code_cache_used_mb":{d["jvm"]["code_cache_used_mb"]},"code_cache_max_mb":{d["jvm"]["code_cache_max_mb"]},"gc_sec":{fmt(d["jvm"]["gc_sec"])}}}')
    return (f'{{"metric":"detail","value":{fmt(d["value"])},"unit":"sec",'
            f'"queries":{qjson(slowest)},"queries_omitted":{len(d["queries"]) - len(slowest)},{adj}}}')


def render_compact(d):
    top3 = sorted(d["queries"].items(), key=lambda kv: -kv[1])[:3]
    errs = json.dumps(d["errors"][:3], separators=(",", ":"))
    return (f'{{"metric":"total","value":{fmt(d["value"])},"unit":"sec",'
            f'"queries":{qjson(top3)},"queries_omitted":{len(d["queries"]) - 3},'
            f'"sf":"{d["sf"]}","n_queries":{len(d["queries"])},'
            f'"n_errors":{len(d["errors"])},"errors":{errs},'
            f'"load":{{"start":{fmt(d["load"]["start"])},"end":{fmt(d["load"]["end"])},"cpus":{d["load"]["cpus"]}}},'
            f'"jvm":{{"code_cache_used_mb":{d["jvm"]["code_cache_used_mb"]},"code_cache_max_mb":{d["jvm"]["code_cache_max_mb"]},"gc_sec":{fmt(d["jvm"]["gc_sec"])}}},'
            f'"data_warm":{str(d["data_warm"]).lower()},"full":"bench_full.json"}}')


def main():
    full_path, multi_path, log_path = sys.argv[1], sys.argv[2], sys.argv[3]
    d = json.loads(open(full_path).readline())
    fresh = parse_timequery_log(log_path)
    patched = []
    for name in list(d["unadjudicated"]):
        if name not in fresh:
            continue
        f = fresh[name]
        x = d["rerun"][name]
        x["fresh"] = min(f, x["fresh"]) if x.get("fresh", -1) > 0 else f
        x["fresh_adjudicated"] = True
        x["adjudicated"] = True
        if x["steady"] > 0:
            x["steady"] = min(x["steady"], f)
        else:
            x["steady"] = f
        best = min(v for v in (x["first"], x["rerun"], x["fresh"]) if v > 0)
        d["queries"][name] = best
        # the fresh fork issues the one-sided contamination verdict too
        if x["first"] > 2.0 * x["fresh"] and name not in d["load_contaminated"]:
            d["load_contaminated"].append(name)
        patched.append(name)
    d["unadjudicated"] = [n for n in d["unadjudicated"] if n not in patched]
    d["value"] = sum(d["queries"].values())
    full_line = render_full(d)
    with open(full_path, "w") as f:
        f.write(full_line + "\n")
    with open(multi_path, "w") as f:
        f.write(full_line + "\n")
        f.write(render_detail(d) + "\n")
        f.write(render_compact(d) + "\n")
    print(f"patched {len(patched)} lines; total now {fmt(d['value'])} s; "
          f"unadjudicated: {d['unadjudicated']}")


if __name__ == "__main__":
    main()
