"""Aggregate device-op times from a jax.profiler trace directory.

Usage: python tools/parse_trace.py /tmp/jtrace [--top 40] [--group]

Reads the newest *.trace.json.gz under the directory, keeps events on TPU
device tracks, and prints the top ops by total duration. `long_name` holds
the fused HLO expression — enough to attribute fusions to source passes
(scope-prefixed instruction names) and to spot layout copies / tiny fusions.
"""

from __future__ import annotations

import argparse
import collections
import gzip
import json
import pathlib
import re


def load_events(trace_dir: str):
    paths = sorted(
        pathlib.Path(trace_dir).rglob("*.trace.json.gz"),
        key=lambda p: p.stat().st_mtime,
    )
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        doc = json.load(f)
    events = doc.get("traceEvents", [])
    # map pid/tid -> track name to find device threads
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") in ("process_name", "thread_name"):
            key = (e.get("pid"), e.get("tid"), e["name"])
            names[key] = e.get("args", {}).get("name", "")
    device_pids = {
        pid for (pid, tid, kind), nm in names.items()
        if kind == "process_name" and ("TPU" in nm or "Device" in nm or "/device" in nm)
    }
    out = []
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        args = e.get("args", {}) or {}
        out.append({
            "name": e.get("name", ""),
            "dur_us": e.get("dur", 0),
            "long_name": args.get("long_name", args.get("hlo_op", "")),
            "tf_op": args.get("tf_op", ""),
            "source": args.get("source", ""),
            "pid": e.get("pid"),
        })
    return out, names


_SCOPE_RE = re.compile(r"(\d\d_[A-Za-z]+)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--group", action="store_true",
                    help="group by op-name prefix instead of individual op")
    ap.add_argument("--scopes", action="store_true",
                    help="attribute to frame-graph node scopes via long_name")
    ap.add_argument("--by-source", action="store_true",
                    help="aggregate device time by the `source` file:line "
                         "XLA metadata (true per-source-line profile)")
    args = ap.parse_args()

    events, names = load_events(args.trace_dir)
    if not events:
        raise SystemExit("no device events found")

    total = sum(e["dur_us"] for e in events)
    agg = collections.defaultdict(lambda: [0, 0])  # key -> [usec, count]
    for e in events:
        if args.by_source:
            src = e["source"] or "(none)"
            key = src.replace("/root/repo/", "")
            agg[key][0] += e["dur_us"]
            agg[key][1] += 1
            continue
        if args.scopes:
            m = _SCOPE_RE.search(e["tf_op"] or "") or _SCOPE_RE.search(
                e["long_name"] or "") or _SCOPE_RE.search(e["name"])
            key = m.group(1) if m else "(unattributed)"
            if m and args.group:
                # finer: node scope + source file:line
                src = (e["source"] or "?").rsplit("/", 1)[-1]
                key = f"{key} {src}"
        elif args.group:
            key = re.sub(r"[.\d]+$", "", e["name"])
        else:
            key = e["name"]
        agg[key][0] += e["dur_us"]
        agg[key][1] += 1

    print(f"device events: {len(events)}  total: {total/1e3:.1f} ms")
    for key, (us, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[: args.top]:
        print(f"  {us/1e3:9.2f} ms  x{cnt:<5} {100*us/total:5.1f}%  {key}")

    if not args.group and not args.scopes:
        # also show the long_name of the top few for fusion attribution
        by_name = collections.defaultdict(int)
        ln = {}
        for e in events:
            by_name[e["name"]] += e["dur_us"]
            ln.setdefault(e["name"], e["long_name"])
        print("\n== top op long_names ==")
        for name, us in sorted(by_name.items(), key=lambda kv: -kv[1])[:12]:
            print(f"-- {name} ({us/1e3:.2f} ms)")
            print(f"   {ln[name][:600]}")


if __name__ == "__main__":
    main()
