"""Minimal XSpace/.xplane.pb reader (no tensorflow dependency).

``jax.profiler.trace`` writes XSpace protos; the only parsers Google ships
live in tensorflow/tsl, which this image doesn't carry. The wire format is
plain protobuf, so this module decodes just the fields the perf tooling
needs (planes -> lines -> events + event-metadata names) with a hand-rolled
varint reader. Field numbers from tsl/profiler/protobuf/xplane.proto:

    XSpace.planes = 1
    XPlane.name = 2, .lines = 3, .event_metadata = 4 (map<int64, XEventMetadata>)
    XEventMetadata.id = 1, .name = 2, .display_name = 4
    XLine.name = 2, .display_name = 11, .events = 4
    XEvent.metadata_id = 1, .offset_ps = 2, .duration_ps = 3

Used by scripts/trace_categories.py to produce the per-category step-time
tables in docs/tpu_notes.md ("MFU roofline").
"""

from __future__ import annotations

import gzip
import os
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Tuple


def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not (b & 0x80):
            return out, i
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message buffer."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fnum, wt = key >> 3, key & 7
        if wt == 0:  # varint
            val, i = _varint(buf, i)
        elif wt == 1:  # fixed64
            val = int.from_bytes(buf[i : i + 8], "little")
            i += 8
        elif wt == 2:  # length-delimited
            ln, i = _varint(buf, i)
            val = buf[i : i + ln]
            i += ln
        elif wt == 5:  # fixed32
            val = int.from_bytes(buf[i : i + 4], "little")
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fnum, wt, val


@dataclass
class Event:
    metadata_id: int
    offset_ps: int
    duration_ps: int


@dataclass
class Line:
    name: str = ""
    events: List[Event] = field(default_factory=list)


@dataclass
class Plane:
    name: str = ""
    event_names: Dict[int, str] = field(default_factory=dict)
    lines: List[Line] = field(default_factory=list)


def _parse_event(buf: bytes) -> Event:
    ev = Event(0, 0, 0)
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            ev.metadata_id = val
        elif fnum == 2:
            # offset_ps is sint64 in some schema revisions (zigzag); both
            # encodings are monotone so ordering survives either way
            ev.offset_ps = val
        elif fnum == 3:
            ev.duration_ps = val
    return ev


def _parse_line(buf: bytes) -> Line:
    line = Line()
    for fnum, _, val in _fields(buf):
        if fnum == 2:
            line.name = val.decode("utf-8", "replace")
        elif fnum == 11 and not line.name:
            line.name = val.decode("utf-8", "replace")
        elif fnum == 4:
            line.events.append(_parse_event(val))
    return line


def _parse_event_metadata(buf: bytes) -> Tuple[int, str]:
    mid, name, disp = 0, "", ""
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            mid = val
        elif fnum == 2:
            name = val.decode("utf-8", "replace")
        elif fnum == 4:
            disp = val.decode("utf-8", "replace")
    return mid, (disp or name)


def _parse_plane(buf: bytes) -> Plane:
    plane = Plane()
    for fnum, _, val in _fields(buf):
        if fnum == 2:
            plane.name = val.decode("utf-8", "replace")
        elif fnum == 3:
            plane.lines.append(_parse_line(val))
        elif fnum == 4:
            # map entry { key=1: int64, value=2: XEventMetadata }
            mid, mname = 0, ""
            for f2, _, v2 in _fields(val):
                if f2 == 1:
                    mid = v2
                elif f2 == 2:
                    mid2, mname = _parse_event_metadata(v2)
                    mid = mid or mid2
            plane.event_names[mid] = mname
    return plane


def parse_xspace(path: str) -> List[Plane]:
    data = open(path, "rb").read()
    if path.endswith(".gz"):
        data = gzip.decompress(data)
    return [
        _parse_plane(val) for fnum, _, val in _fields(data) if fnum == 1
    ]


def find_xplane(logdir: str) -> str:
    """Newest .xplane.pb under a jax.profiler.trace logdir."""
    hits = []
    for root, _, files in os.walk(logdir):
        for f in files:
            if f.endswith(".xplane.pb"):
                p = os.path.join(root, f)
                hits.append((os.path.getmtime(p), p))
    if not hits:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    return max(hits)[1]


def device_op_totals(
    planes: List[Plane], *, async_lines: bool = False
) -> Dict[str, Tuple[float, int]]:
    """Sum device-plane op durations by event name.

    Returns {event_name: (total_ms, count)} over the compute lines of
    every TPU device plane ("XLA Ops" holds the leaf fusions, which are
    non-overlapping per core — their sum is exclusive device time and
    matches the wall step). With ``async_lines=True`` it instead sums the
    "Async XLA Ops" lines: DMA-queue copies that run CONCURRENTLY with
    the compute line (their total routinely exceeds the wall step — it is
    overlap, not serial time; the training step shows ~1.8k async weight/
    remat prefetches per step this way).
    """
    totals: Dict[str, List[float]] = defaultdict(lambda: [0.0, 0])
    for plane in planes:
        if "/device:TPU" not in plane.name and "TPU" not in plane.name:
            continue
        for line in plane.lines:
            # steps/modules lines double-count their children; async DMA
            # lines overlap the compute line (opt-in via async_lines)
            lname = line.name.lower()
            if "step" in lname or "module" in lname:
                continue
            if ("async" in lname) != async_lines:
                continue
            for ev in line.events:
                name = plane.event_names.get(ev.metadata_id, f"#{ev.metadata_id}")
                # control-flow wrapper events span their body ops, which
                # are ALSO emitted on the same line — counting both nearly
                # doubles scan/while-heavy programs (measured: the scanned
                # train step sums to 287 ms/step with wrappers vs its
                # 170 ms wall; 169 ms without)
                root = name.split(".", 1)[0]
                if root in ("while", "conditional", "call"):
                    continue
                t = totals[name]
                t[0] += ev.duration_ps / 1e9
                t[1] += 1
    return {k: (v[0], v[1]) for k, v in totals.items()}
