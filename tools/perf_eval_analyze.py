"""Joined trace+HLO roofline table for a profiled jitted function.

Offline pass over artifacts produced by tools/perf_trace_eval.py:
  /tmp/eval_hlo.txt                    (compiled().as_text())
  /tmp/evaltrace/plugins/profile/...   (jax.profiler.trace)

For every device op in the profile: device time, identity (op_name
metadata), conv/dot FLOPs resolved from the called fusion computation's
body, achieved TF/s and % of v5e bf16 peak — the evidence table for "how
far from speed-of-light is each op", plus a by-category rollup.

Usage: python tools/perf_eval_analyze.py [hlo.txt] [trace_dir]
"""
import gzip
import json
import glob
import os
import re
import sys
from collections import defaultdict

PEAK_TF = 197.0  # v5e bf16
SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_dims(s):
    m = SHAPE_RE.match(s)
    if not m:
        return None
    return [int(x) for x in m.group(2).split(",") if x]


def prod(dims):
    n = 1
    for d in dims:
        n *= d
    return n


def parse_hlo(path):
    """-> (instr: name -> line, comps: comp_name -> [lines], sigs: comp_name
    -> {param_name: shape_str})."""
    instr, comps, sigs = {}, {}, {}
    cur = None
    for line in open(path):
        if line.startswith("%") and line.rstrip().endswith("{"):
            cur = line.split()[0].lstrip("%")
            comps[cur] = []
            # signature: %name (p0: bf16[...], p1: f32[...]) -> ...
            sig = {}
            m = re.search(r"\(([^)]*)\)\s*->", line)
            if m:
                for part in m.group(1).split(","):
                    if ":" in part:
                        pn, ty = part.split(":", 1)
                        sig[pn.strip()] = ty.strip()
            sigs[cur] = sig
            continue
        if line.startswith("}"):
            cur = None
            continue
        ls = line.strip()
        m = re.match(r"%([\w.\-]+)\s*=\s*(.*)", ls)
        if not m:
            continue
        if cur is not None:
            comps[cur].append((m.group(1), m.group(2)))
        instr[m.group(1)] = m.group(2)
    return instr, comps, sigs


def op_flops(rest, body, sig):
    """FLOPs of conv/dot lines in `body` (list of (name, rest)); operand
    shapes resolved from the same body or the computation signature."""

    def local_shape(opname):
        opname = opname.lstrip("%")
        for nm, r in body:
            if nm == opname:
                return shape_dims(r)
        if opname in sig:
            return shape_dims(sig[opname])
        return None

    flops = 0
    detail = []
    for nm, r in body:
        if "convolution(" in r:
            out = shape_dims(r)
            ops = re.search(r"convolution\(([^)]*)\)", r)
            args = [a.strip() for a in ops.group(1).split(",")]
            k = local_shape(args[1])
            fgc = re.search(r"feature_group_count=(\d+)", r)
            g = int(fgc.group(1)) if fgc else 1
            # kernel dim labels ("01io", "io0", ...) locate the output-feature
            # dim; FLOPs = 2 * out_elems * (kernel_elems / out_features) —
            # covers 2D convs AND dots lowered as 1D convs
            dl = re.search(r"dim_labels=\S+_([a-z0-9]+)->", r)
            if out and k and dl and "o" in dl.group(1) and len(dl.group(1)) == len(k):
                ko = k[dl.group(1).index("o")]
                flops += 2 * prod(out) * prod(k) // ko // g
                detail.append(f"conv {k}->{out}")
        elif re.search(r"\bdot\(", r):
            out = shape_dims(r)
            ops = re.search(r"dot\(([^)]*)\)", r)
            args = [a.strip() for a in ops.group(1).split(",")]
            a = local_shape(args[0])
            cdim = re.search(r"lhs_contracting_dims={(\d+)", r)
            if out and a and cdim:
                flops += 2 * prod(out) * a[int(cdim.group(1))]
                detail.append(f"dot {a}->{out}")
    return flops, detail


def load_trace(trace_dir):
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime,
    )
    with gzip.open(paths[-1], "rt") as fz:
        data = json.load(fz)
    ev = data["traceEvents"]
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev = {p for p, n in pid_names.items() if "TPU" in n}
    tot, cnt = defaultdict(float), defaultdict(int)
    for e in ev:
        if (
            e.get("ph") == "X"
            and e.get("pid") in dev
            and not e["name"].startswith("jit_")
        ):
            tot[e["name"]] += e.get("dur", 0.0)
            cnt[e["name"]] += 1
    return tot, cnt


def category(op):
    """Rollup key from the op_name metadata path."""
    if "attn" in op or "attention" in op:
        return "attention"
    if "conv_in" in op or "conv_out" in op:
        return "io convs (3ch)"
    if "upsample" in op or "downsample" in op:
        return "resample convs"
    if "conv_shortcut" in op:
        return "shortcut convs (1x1)"
    if "_gn_conv/conv" in op:
        return "res-block 3x3 convs"
    if "GroupNorm" in op or "norm" in op:
        return "groupnorm"
    if "time" in op or "dense" in op.lower() or "Dense" in op:
        return "time-emb mlp"
    return "other"


def main():
    hlo_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/eval_hlo.txt"
    trace_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/evaltrace"
    instr, comps, sigs = parse_hlo(hlo_path)
    tot, cnt = load_trace(trace_dir)
    n_rep = max(cnt.values()) if cnt else 1
    total_us = sum(tot.values())
    print(
        f"device leaf total {total_us/1e3:.2f} ms over {n_rep} evals "
        f"-> {total_us/1e3/n_rep:.2f} ms/eval"
    )
    rows = []
    cat_ms = defaultdict(float)
    cat_fl = defaultdict(float)
    for nm, us in tot.items():
        per = us / n_rep / 1e3  # ms/eval
        rest = instr.get(nm, "")
        opn = re.search(r'op_name="([^"]+)"', rest)
        op = opn.group(1) if opn else "?"
        called = re.search(r"calls=%([\w.\-]+)", rest)
        flops, detail = 0, []
        if called and called.group(1) in comps:
            flops, detail = op_flops(
                rest, comps[called.group(1)], sigs.get(called.group(1), {})
            )
        elif "convolution(" in rest or re.search(r"\bdot\(", rest):
            flops, detail = op_flops(rest, [(nm, rest)], {})
        tf = flops / (per / 1e3) / 1e12 if per > 0 and flops else 0.0
        rows.append((per, nm, op, flops / 1e9, tf, "; ".join(detail)))
        c = category(op)
        cat_ms[c] += per
        cat_fl[c] += flops
    rows.sort(key=lambda r: -r[0])
    for per, nm, op, gf, tf, shp in rows[:44]:
        pct = 100 * tf / PEAK_TF
        print(
            f"{per:7.3f} ms {gf:8.1f} GF {tf:6.1f} TF/s {pct:5.1f}% "
            f"{nm[:26]:26s} {op.split('UNet2D/')[-1][:60]}"
        )
        if shp:
            print(f"{'':11s}{shp}")
    print("\n== by category ==")
    tot_ms = sum(cat_ms.values())
    for c, ms in sorted(cat_ms.items(), key=lambda kv: -kv[1]):
        tf = cat_fl[c] / (ms / 1e3) / 1e12 if ms else 0.0
        print(
            f"{ms:7.3f} ms ({100*ms/tot_ms:4.1f}%) {cat_fl[c]/1e9:8.1f} GF "
            f"{tf:6.1f} TF/s {100*tf/PEAK_TF:5.1f}% {c}"
        )
    print(
        f"\ntotal {tot_ms:.2f} ms, {sum(cat_fl.values())/1e12:.2f} TF -> "
        f"{sum(cat_fl.values())/(tot_ms/1e3)/1e12:.1f} TF/s "
        f"({100*sum(cat_fl.values())/(tot_ms/1e3)/1e12/PEAK_TF:.1f}% of v5e bf16 peak)"
    )


if __name__ == "__main__":
    main()
