"""Per-HLO-op device-time breakdown from a TPU profiler .xplane.pb.

The trace-viewer JSON export caps at ~1M events; a busy host thread can
evict every device-side XLA-op event from it (observed: a 45 s jitted
training program whose JSON shows ONE opaque 'Steps' event). The
vm.xplane.pb written next to it always has the full device timeline, so
this tool parses it directly -- a minimal protobuf wire-format reader for
the (long-stable) XSpace/XPlane schema, no TensorFlow needed.

Usage: python scripts/xplane_top_ops.py <profile_dir-or-xplane.pb>
           [--top 40] [--by op|category|program]
"""

import argparse
import collections
import glob
import os
import struct


# --- minimal protobuf wire reader -------------------------------------------

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


def fields(buf):
    """Yield (field_number, wire_type, value) over a serialized message.
    value is int for varint/fixed, memoryview for length-delimited."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = struct.unpack_from("<Q", buf, i)[0]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack_from("<I", buf, i)[0]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fn, wt, v


def _map_entry(buf):
    """Parse a proto map entry: field 1 = key (varint), field 2 = value msg."""
    k = v = None
    for fn, _, val in fields(buf):
        if fn == 1:
            k = val
        elif fn == 2:
            v = val
    return k, v


# --- XSpace schema (tensorflow/core/profiler/protobuf/xplane.proto) ---------
# XSpace.planes = 1; XPlane: id=1 name=2 lines=3 event_metadata=4(map)
# stat_metadata=5(map); XLine: id=1 name=2 timestamp_ns=3 events=4
# display_name=11; XEvent: metadata_id=1 offset_ps=2 duration_ps=3 stats=4;
# XEventMetadata: id=1 name=2 display_name=4 stats=5;
# XStat: metadata_id=1 double=2 uint64=3 int64=4 str=5 bytes=6 ref=7;
# XStatMetadata: id=1 name=2.


def parse_event_metadata(buf):
    md = {"name": "", "display_name": ""}
    for fn, _, v in fields(buf):
        if fn == 2:
            md["name"] = bytes(v).decode("utf-8", "replace")
        elif fn == 4:
            md["display_name"] = bytes(v).decode("utf-8", "replace")
    return md


def parse_stat(buf, stat_names):
    mid = None
    val = None
    for fn, wt, v in fields(buf):
        if fn == 1:
            mid = v
        elif fn in (2,):
            val = struct.unpack("<d", struct.pack("<Q", v))[0] if wt == 1 else v
        elif fn in (3, 4, 7):
            val = v
        elif fn in (5, 6):
            val = bytes(v).decode("utf-8", "replace")
    return stat_names.get(mid, str(mid)), val


def parse_plane(buf, want_lines):
    """Returns (plane_name, {line_name: [(metadata_id, dur_ps, stats_dict)]},
    event_metadata: {id: md})."""
    name = ""
    line_bufs = []
    ev_md = {}
    stat_names = {}
    for fn, _, v in fields(buf):
        if fn == 2:
            name = bytes(v).decode("utf-8", "replace")
        elif fn == 3:
            line_bufs.append(v)
        elif fn == 4:
            k, mv = _map_entry(v)
            if mv is not None:
                ev_md[k] = parse_event_metadata(mv)
        elif fn == 5:
            k, mv = _map_entry(v)
            if mv is not None:
                for fn2, _, v2 in fields(mv):
                    if fn2 == 2:
                        stat_names[k] = bytes(v2).decode("utf-8", "replace")
    lines = {}
    for lb in line_bufs:
        lname = ""
        disp = ""
        evs = []
        ev_bufs = []
        for fn, _, v in fields(lb):
            if fn == 2:
                lname = bytes(v).decode("utf-8", "replace")
            elif fn == 11:
                disp = bytes(v).decode("utf-8", "replace")
            elif fn == 4:
                ev_bufs.append(v)
        lname = disp or lname
        if want_lines and not any(w in lname for w in want_lines):
            continue
        for eb in ev_bufs:
            mid = dur = 0
            stats = {}
            for fn, _, v in fields(eb):
                if fn == 1:
                    mid = v
                elif fn == 3:
                    dur = v
                elif fn == 4:
                    k, val = parse_stat(v, stat_names)
                    stats[k] = val
            evs.append((mid, dur, stats))
        lines.setdefault(lname, []).extend(evs)
    return name, lines, ev_md


def iter_planes(path):
    with open(path, "rb") as f:
        buf = memoryview(f.read())
    for fn, _, v in fields(buf):
        if fn == 1:
            yield v


_OPCODE_RE = None


def hlo_opcode(name):
    """Derive the opcode (and fusion kind) from an HLO instruction's text,
    e.g. '%x = f32[..]{..} fusion(...), kind=kLoop, ...' -> 'fusion.kLoop'."""
    global _OPCODE_RE
    import re

    if _OPCODE_RE is None:
        _OPCODE_RE = re.compile(r"[\}\)\]] ([a-z][a-z0-9-]*)\(")
    m = _OPCODE_RE.search(name)
    op = m.group(1) if m else "?"
    if op == "fusion":
        k = re.search(r"kind=k(\w+)", name)
        if k:
            op = f"fusion.k{k.group(1)}"
    return op


def find_xplane(path_or_dir):
    if os.path.isfile(path_or_dir):
        return path_or_dir
    pbs = sorted(glob.glob(os.path.join(path_or_dir, "plugins", "profile", "*", "*.xplane.pb")))
    if not pbs:
        raise SystemExit(f"no .xplane.pb under {path_or_dir}/plugins/profile/*/")
    return pbs[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="profile dir (as passed to start_trace) or an .xplane.pb")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by", choices=["op", "category", "program"], default="op")
    ap.add_argument("--line", default="XLA Ops", help="device line to aggregate")
    args = ap.parse_args()

    path = find_xplane(args.path)
    tot = collections.Counter()
    cnt = collections.Counter()
    cat_of = {}
    grand = 0
    found = False
    for pbuf in iter_planes(path):
        # Cheap pre-filter: device planes are named /device:TPU:N.
        head = bytes(pbuf[:64])
        if b"TPU" not in head and b"GPU" not in head:
            continue
        name, lines, ev_md = parse_plane(pbuf, want_lines=(args.line, "XLA Modules"))
        ops = lines.get(args.line, [])
        if not ops:
            continue
        found = True
        for mid, dur, stats in ops:
            md = ev_md.get(mid, {})
            full = md.get("name", "")
            cat = str(stats.get("hlo_category", "")) or hlo_opcode(full)
            if args.by == "op":
                key = md.get("display_name") or full or str(mid)
            elif args.by == "category":
                key = cat
            else:
                key = str(stats.get("program_id", stats.get("run_id", "?")))
            tot[key] += dur
            cnt[key] += 1
            grand += dur
            cat_of.setdefault(key, cat)
    if not found:
        raise SystemExit(f"no '{args.line}' line with events found in {path}")
    print(f"xplane: {path}")
    print(f"total device op time: {grand/1e9:.3f} ms")
    print(f"{'total ms':>10}  {'count':>7}  {'%':>6}  {'category':<18}  op")
    for key, d in tot.most_common(args.top):
        print(
            f"{d/1e9:10.3f}  {cnt[key]:7d}  {100*d/grand:5.1f}%  "
            f"{cat_of.get(key, ''):<18}  {key[:100]}"
        )


if __name__ == "__main__":
    main()
