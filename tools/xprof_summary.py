#!/usr/bin/env python
"""Summarize an XLA profiler trace (.xplane.pb) without TensorBoard.

Companion to `run.py --profile LOGDIR` / utils.profiling.xla_trace: prints
per-op-class device time so kernel work can be attributed offline (this
sandbox has no TensorBoard UI).  Uses a minimal protobuf wire-format
parser — no schema dependencies.

Usage:
    python tools/xprof_summary.py /tmp/xprof            # newest trace in dir
    python tools/xprof_summary.py path/to/x.xplane.pb --top 30
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys


def _varint(buf: bytes, i: int):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _fields(buf: bytes):
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fn, wt, v


def _parse_plane(pbuf: bytes):
    """XPlane: 2=name, 3=lines, 4=event_metadata map {1:key, 2:{1:id,2:name}}"""
    name = b""
    lines = []
    emeta = {}
    for fn, wt, v in _fields(pbuf):
        if fn == 2 and wt == 2:
            name = v
        elif fn == 3 and wt == 2:
            lines.append(v)
        elif fn == 4 and wt == 2:
            k = None
            m = None
            for fn2, wt2, v2 in _fields(v):
                if fn2 == 1 and wt2 == 0:
                    k = v2
                elif fn2 == 2 and wt2 == 2:
                    m = v2
            if m is not None:
                mid, mname = k, b""
                for fn3, wt3, v3 in _fields(m):
                    if fn3 == 1 and wt3 == 0:
                        mid = v3
                    elif fn3 == 2 and wt3 == 2:
                        mname = v3
                emeta[mid] = mname.decode(errors="replace")
    return name.decode(errors="replace"), lines, emeta


def _parse_line(lbuf: bytes):
    """XLine: 2=name(bytes), 4=events. XEvent: 1=metadata_id, 3=duration_ps"""
    name = b""
    events = []
    for fn, wt, v in _fields(lbuf):
        if fn == 2 and wt == 2:
            name = v
        elif fn == 4 and wt == 2:
            events.append(v)
    return name.decode(errors="replace"), events


def _parse_event(ebuf: bytes):
    mid = None
    dur = 0
    for fn, wt, v in _fields(ebuf):
        if fn == 1 and wt == 0:
            mid = v
        elif fn == 3 and wt == 0:
            dur = v
    return mid, dur


def classify(hlo_name: str):
    """Kind + output shape from an HLO one-liner; scatter/gather fusions
    are recognized by their signature operands."""
    m = re.match(r"%([a-z\-]+)[\.\d]* = (\S+?)[\{ ]", hlo_name)
    kind = m.group(1) if m else "?"
    shape = m.group(2) if m else "?"
    if kind == "fusion" and re.search(r"s32\[\d+\]", hlo_name):
        kind = "scatter/gather-fusion"
    return kind, shape


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace", help=".xplane.pb file or a --profile logdir")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--by-shape", action="store_true",
                    help="break classes down by output shape")
    args = ap.parse_args()

    path = args.trace
    if os.path.isdir(path):
        cands = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                                 recursive=True))
        if not cands:
            sys.exit(f"no .xplane.pb under {path}")
        path = cands[-1]
    buf = open(path, "rb").read()

    for fn, wt, v in _fields(buf):
        if fn != 1 or wt != 2:
            continue
        pname, lines, emeta = _parse_plane(v)
        for lb in lines:
            lname, events = _parse_line(lb)
            if lname != "XLA Ops" or not events:
                continue
            agg = collections.Counter()
            for eb in events:
                mid, dur = _parse_event(eb)
                nm = emeta.get(mid, "?")
                if nm.startswith("%while"):
                    continue  # wrapper double-counts its body
                kind, shape = classify(nm)
                agg[(kind, shape) if args.by_shape else kind] += dur
            tot = sum(agg.values())
            if not tot:
                continue
            print(f"== {pname} :: XLA Ops  "
                  f"(device time {tot / 1e9:.1f} ms, while-wrapper excluded)")
            for k, d in agg.most_common(args.top):
                label = f"{k[0]:24s} {k[1]}" if args.by_shape else k
                print(f"  {d / 1e9:9.2f} ms  {100 * d / tot:5.1f}%  {label}")


if __name__ == "__main__":
    main()
