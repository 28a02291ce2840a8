#!/usr/bin/env python3
"""Probe-normalized bench comparison (r19).

Compares two bench_out.json artifacts and, when both carry the r19
`probe_sec` host-calibration array (a fixed-work, data-independent
CPU-bound query timed around each pass), divides the suite-level delta
by the probe ratio so a reviewer sees how much of a round-over-round
swing is the HOST and how much is the PLANS. Per-query rows are still
gated raw (>1.3x AND >0.5s, the standing gate) — the probe is a
suite-level attribution signal, not a per-query excuse.

Usage: tools/bench_compare.py OLD.json NEW.json [--gate-ratio 1.3]
       [--gate-abs 0.5]

Exit code 0 always (reporting tool, not a gate).
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main(argv):
    # accept both '--flag value' (the usage string's form) and
    # '--flag=value' (ADVICE r19: the space form used to fall into
    # positional args and silently print usage)
    args, opts, rest = [], {}, list(argv[1:])
    while rest:
        a = rest.pop(0)
        if a.startswith("--"):
            if "=" in a:
                k, v = a.split("=", 1)
                opts[k] = v
            elif rest:
                opts[a] = rest.pop(0)
            else:
                print(f"flag {a} needs a value")
                return 2
        else:
            args.append(a)
    if len(args) != 2:
        print(__doc__)
        return 0
    gate_ratio = float(opts.get("--gate-ratio", 1.3))
    gate_abs = float(opts.get("--gate-abs", 0.5))
    old, new = load(args[0]), load(args[1])
    co, cn = old.get("cpus"), new.get("cpus")
    if co is not None and cn is not None and co != cn:
        print(f"WARNING: cpus differ ({co} vs {cn}) - NOT like-for-like; "
              "a local[8] suite reads ~1.7x slower than local[32] on the "
              "same HEAD (measured r19)")
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    to = sum(qo[k] for k in common)
    tn = sum(qn[k] for k in common)
    print(f"common {len(common)} queries: {to:.1f}s -> {tn:.1f}s "
          f"= {tn / to:.3f}x raw")
    po, pn = old.get("probe_sec"), new.get("probe_sec")
    if po and pn:
        # min of each probe array: the machine's best observed fixed-work
        # time that run (mins, like the per-query methodology, so a
        # single stalled probe sample can't smear the factor)
        host = min(pn) / min(po)
        print(f"probe: old {po} new {pn} -> host factor {host:.3f}x "
              f"(min-over-samples)")
        print(f"probe-normalized suite ratio: {tn / to / host:.3f}x")
        spread_o = max(po) / min(po)
        spread_n = max(pn) / min(pn)
        print(f"intra-run host spread: old {spread_o:.2f}x "
              f"new {spread_n:.2f}x")
    else:
        print("probe_sec absent on one side - raw comparison only "
              "(pre-r19 artifact)")
    regs = [(qn[k] / max(qo[k], 1e-3), qo[k], qn[k], k) for k in common
            if qn[k] > gate_ratio * qo[k] and qn[k] - qo[k] > gate_abs]
    print(f"per-query regressions (> {gate_ratio}x and > {gate_abs}s "
          f"raw): {len(regs)}")
    for r, a, b, k in sorted(regs, reverse=True):
        print(f"  {k}: {a:.2f} -> {b:.2f} ({r:.2f}x)")
    only_new = sorted(set(qn) - set(qo))
    if only_new:
        print("new queries:",
              {k: round(qn[k], 3) for k in only_new})
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
