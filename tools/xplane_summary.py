"""Minimal XSpace (.xplane.pb) summarizer — no tensorflow/xprof dependency.

Parses the raw protobuf wire format of a ``jax.profiler.trace`` capture and
prints per-op total device time, grouped by event name, for every device
plane (``/device:TPU:*``). This is the roofline attribution tool for the
Pallas/XLA hot paths (the full profile protos aren't importable in this
container — only the wire bytes are available).

Usage:
    python tools/xplane_summary.py /tmp/trace_dir [--top 30] [--line-filter s]

Wire schema (tensorflow/tsl profiler xplane.proto):
    XSpace:   planes=1 (msg XPlane)
    XPlane:   id=1, name=2, lines=3 (msg XLine), event_metadata=4 (map),
              stat_metadata=5, stats=6
    XLine:    id=1, name=2, timestamp_ns=3, events=4 (msg XEvent), ...
    XEvent:   metadata_id=1, offset_ps=2, duration_ps=3, stats=4
    map entry: key=1, value=2 (msg XEventMetadata{id=1, name=2, ...})
"""
from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict


def _varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _fields(buf):
    """Yield (field_no, wire_type, value) over a message's bytes."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v, i = buf[i:i + 8], i + 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v, i = buf[i:i + ln], i + ln
        elif wt == 5:
            v, i = buf[i:i + 4], i + 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def summarize(path, top=30, line_filter=None):
    buf = open(path, "rb").read()
    for fno, _, plane_b in _fields(buf):
        if fno != 1:
            continue
        name = ""
        meta = {}
        lines = []
        for pf, _, pv in _fields(plane_b):
            if pf == 2:
                name = pv.decode()
            elif pf == 4:  # event_metadata map entry
                k = v = None
                for mf, _, mv in _fields(pv):
                    if mf == 1:
                        k = mv
                    elif mf == 2:
                        for ef, _, ev in _fields(mv):
                            if ef == 2:
                                v = ev.decode()
                meta[k] = v or ""
            elif pf == 3:
                lines.append(pv)
        if "TPU" not in name and "device" not in name.lower():
            continue
        totals = defaultdict(int)
        counts = defaultdict(int)
        for line_b in lines:
            lname = ""
            evs = []
            for lf, _, lv in _fields(line_b):
                if lf == 2:
                    lname = lv.decode()
                elif lf == 4:
                    evs.append(lv)
            if line_filter and line_filter not in lname:
                continue
            for ev in evs:
                mid = dur = 0
                for ef, _, evv in _fields(ev):
                    if ef == 1:
                        mid = evv
                    elif ef == 3:
                        dur = evv
                totals[meta.get(mid, str(mid))] += dur
                counts[meta.get(mid, str(mid))] += 1
        if not totals:
            continue
        print(f"== plane {name} ==")
        tot = sum(totals.values())
        print(f"   total {tot / 1e9:.3f} ms over {sum(counts.values())} events")
        for k in sorted(totals, key=totals.get, reverse=True)[:top]:
            print(f"   {totals[k] / 1e9:9.3f} ms  x{counts[k]:<5d} {k[:110]}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 30
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])
    lf = None
    if "--line-filter" in sys.argv:
        lf = sys.argv[sys.argv.index("--line-filter") + 1]
    root = args[0] if args else "."
    paths = sorted(glob.glob(os.path.join(root, "**", "*.xplane.pb"),
                             recursive=True)) or [root]
    for p in paths:
        print(f"# {p}")
        summarize(p, top=top, line_filter=lf)


if __name__ == "__main__":
    main()
