"""Drill into a train-step trace: op-count + time by name family and shape.

Usage: python tools/trace_buckets.py /tmp/xp_step [n_steps]
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
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    d = load(trace_dir)
    ev = d.get("traceEvents", [])
    tnames = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"].get("name")

    fam_t = collections.Counter()
    fam_n = collections.Counter()
    shape_t = collections.Counter()
    shape_n = collections.Counter()
    total = 0.0
    n_ops = 0
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if tnames.get((e["pid"], e["tid"])) != "XLA Ops":
            continue
        name = e.get("name", "?")
        if name.startswith("while"):  # scan wrapper: parents, not leaves
            continue
        fam = re.sub(r"[.\d]+$", "", name)
        a = e.get("args") or {}
        ln = a.get("long_name") or ""
        m = re.search(r"=\s*\(?(bf16|f32|s32|u32|pred|s8|u8)\[([0-9,]*)\]", ln)
        shape = f"{m.group(1)}[{m.group(2)}]" if m else "?"
        fam_t[fam] += e["dur"]
        fam_n[fam] += 1
        key = (fam, shape)
        shape_t[key] += e["dur"]
        shape_n[key] += 1
        total += e["dur"]
        n_ops += 1

    print(f"total leaf {total/n_steps/1e3:.2f} ms/step, {n_ops//n_steps} ops/step")
    print("\nby op family (time):")
    for k, v in fam_t.most_common(25):
        print(f"{v/n_steps/1e3:8.3f} ms/step {fam_n[k]//n_steps:6d} ops  {k}")
    print("\nby op family (count):")
    for k, v in fam_n.most_common(15):
        print(f"{v//n_steps:6d} ops {fam_t[k]/n_steps/1e3:8.3f} ms/step  {k}")
    print("\ntop (family, shape) by time:")
    for (fam, shape), v in shape_t.most_common(35):
        print(f"{v/n_steps/1e3:8.3f} ms/step {shape_n[(fam,shape)]//n_steps:5d} ops  {fam:28s} {shape}")


if __name__ == "__main__":
    main()
