"""Summarize a jax.profiler trace: leaf-op time by shape bucket + top ops.

Usage: python tools/analyze_trace.py /tmp/xp_step [n_steps]
"""

import collections
import glob
import gzip
import json
import re
import sys


def load(trace_dir):
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    return json.load(gzip.open(paths[-1]))


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xp_step"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    d = load(trace_dir)
    ev = d.get("traceEvents", [])
    pnames, tnames = {}, {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"].get("name")

    buck = collections.Counter()
    cnt = collections.Counter()
    top = collections.Counter()
    args = {}
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if tnames.get((e["pid"], e["tid"])) != "XLA Ops":
            continue
        a = e.get("args") or {}
        ln = a.get("long_name") or ""
        m = re.search(r"=\s*\(?(bf16|f32|s32|u32|pred|s8)\[([0-9,]*)\]", ln)
        b = "other"
        if m:
            dims = m.group(2)
            if dims.startswith("12,"):
                b = "disc(12,...)"
            elif dims.startswith("6,2,512") or dims.startswith("6,512"):
                b = "seq(6,512...)"
            elif dims.startswith("6,"):
                b = "gen(6,...)"
            elif dims.startswith("1,"):
                b = "(1,...)"
            else:
                b = "param/other"
        buck[b] += e["dur"]
        cnt[b] += 1
        top[e.get("name", "?")] += e["dur"]
        if e.get("name") not in args:
            args[e.get("name")] = ln
    tot = sum(buck.values())
    print(f"total leaf {tot/n_steps/1e3:.1f} ms/step "
          f"({sum(cnt.values())//n_steps} ops/step)")
    for k, v in buck.most_common():
        print(f"{v/n_steps/1e3:8.2f} ms/step {cnt[k]//n_steps:6d} ops  {k}")
    print("\ntop ops:")
    for k, v in top.most_common(20):
        print(f"{v/n_steps/1e3:8.3f} ms/step  {k[:40]:40s} {args.get(k,'')[:80]}")


if __name__ == "__main__":
    main()
