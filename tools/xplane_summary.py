"""Summarize a jax.profiler xplane.pb trace without TensorBoard.

Usage: python tools/xplane_summary.py /path/to/trace_dir_or_xplane.pb [N]

Decodes the XSpace protobuf by hand (minimal varint wire parser — the
sandbox's tensorboard_plugin_profile is ABI-broken) and prints per-op
total durations for each device plane: the op-level profile view the
reference framework lacks entirely (SURVEY.md section 5.1).

Wire schema (observed in this jax build's traces):
  XSpace.planes=1; XPlane{id=1,name=2,lines=3,event_metadata=4}
  XLine{id=1,name=2,events=4}; XEvent{metadata_id=1,offset_ps=2,duration_ps=3}
  XEventMetadata map entry {key=1, value=2->XEventMetadata{id=1,name=2,
  display_name=3}}
"""

import collections
import glob
import sys


def _varint(buf, i):
    x = s = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def _fields(buf):
    """Yield (field_number, wire_type, value_bytes_or_int)."""
    i, n = 0, len(buf)
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
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def summarize(path, top=30):
    files = ([path] if path.endswith(".pb")
             else glob.glob(path + "/**/*.xplane.pb", recursive=True))
    buf = open(files[0], "rb").read()
    for fn, _, plane in _fields(buf):
        if fn != 1:
            continue
        name, lines, meta = "", [], {}
        for pf, _, pv in _fields(plane):
            if pf == 2:
                name = pv.decode()
            elif pf == 3:
                lines.append(pv)
            elif pf == 4:  # map entry
                k = v = disp = None
                for mf, _, mv in _fields(pv):
                    if mf == 1:
                        k = mv
                    elif mf == 2:
                        for ef, _, ev in _fields(mv):
                            if ef == 2:
                                v = ev.decode()
                            elif ef == 3:
                                disp = ev.decode()
                if k is not None:
                    meta[k] = disp or v or str(k)
        if not ("TPU" in name or "tpu" in name.lower()):
            continue
        for line in lines:
            lname = ""
            evs = []
            for lf, wt, lv in _fields(line):
                if lf == 2 and wt == 2:
                    try:
                        lname = lv.decode()
                    except UnicodeDecodeError:
                        pass
                elif lf == 4 and wt == 2:
                    evs.append(lv)
            if lname != "XLA Ops" or not evs:
                continue
            tot = collections.Counter()
            for lv in evs:
                mid = dur = 0
                for ef, _, ev in _fields(lv):
                    if ef == 1:
                        mid = ev
                    elif ef == 3:
                        dur = ev
                full = meta.get(mid, str(mid))
                # "%name = type[...] op-kind(...)": bucket by the fusion /
                # custom-call name for readability
                label = full.split(" = ")[0].lstrip("%")
                label = label.rsplit(".", 1)[0]  # drop instance suffix
                tot[label] += dur
            total = sum(tot.values())
            print(f"\n== plane: {name} / {lname}  "
                  f"(sum of op time {total/1e12:.3f}s)")
            for opname, ps in tot.most_common(top):
                print(f"{ps/1e12:9.4f}s  {100*ps/max(total,1):5.1f}%  "
                      f"{opname[:100]}")


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
