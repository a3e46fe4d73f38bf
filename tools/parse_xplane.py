"""Parse a jax.profiler xplane trace into a per-op device-time table.

The environment's tensorboard_plugin_profile/tensorflow xplane bindings are
broken (protobuf version skew), so this carries a MINIMAL hand-rolled
subset of tensorflow/core/profiler/protobuf/xplane.proto (public schema)
compiled on the fly with the baked-in protoc.

Usage: python tools/parse_xplane.py <logdir> [top_n]
Aggregates XEvent durations by event-metadata name over the device
planes (/device:TPU:*) and prints the top ops by total time.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import tempfile

_XPLANE_PROTO = """
syntax = "proto3";
package xprof;

message XSpace { repeated XPlane planes = 1; }

message XPlane {
  int64 id = 1;
  string name = 2;
  repeated XLine lines = 3;
  map<int64, XEventMetadata> event_metadata = 4;
  map<int64, XStatMetadata> stat_metadata = 5;
}

message XLine {
  int64 id = 1;
  string name = 2;
  int64 timestamp_ns = 3;
  repeated XEvent events = 4;
  int64 display_id = 10;
  string display_name = 11;
}

message XEvent {
  int64 metadata_id = 1;
  oneof data {
    int64 offset_ps = 2;
    int64 num_occurrences = 5;
  }
  int64 duration_ps = 3;
  repeated XStat stats = 4;
}

message XStat {
  int64 metadata_id = 1;
  oneof value {
    double double_value = 2;
    uint64 uint64_value = 3;
    int64 int64_value = 4;
    string str_value = 5;
    bytes bytes_value = 6;
    uint64 ref_value = 7;
  }
}

message XEventMetadata {
  int64 id = 1;
  string name = 2;
  string display_name = 3;
  bytes metadata = 4;
}

message XStatMetadata {
  int64 id = 1;
  string name = 2;
  string description = 3;
}
"""


def _load_pb2():
    d = tempfile.mkdtemp(prefix="xplane_proto_")
    with open(os.path.join(d, "xplane_min.proto"), "w") as f:
        f.write(_XPLANE_PROTO)
    subprocess.run(["protoc", f"--python_out={d}", "-I", d,
                    "xplane_min.proto"], check=True)
    sys.path.insert(0, d)
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    import xplane_min_pb2  # noqa: E402

    return xplane_min_pb2


def parse(logdir: str, top_n: int = 40):
    pb2 = _load_pb2()
    paths = sorted(glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise SystemExit(f"no .xplane.pb under {logdir}")
    space = pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    rows = []
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        agg: dict[str, list[float]] = {}
        for line in plane.lines:
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                a = agg.setdefault(name, [0.0, 0])
                a[0] += ev.duration_ps / 1e9  # -> ms
                a[1] += 1
        if agg:
            rows.append((plane.name, agg))
    for pname, agg in rows:
        total = sum(v[0] for v in agg.values())
        print(f"\n== plane: {pname} (sum of event time {total:.1f} ms over "
              f"{sum(v[1] for v in agg.values())} events) ==")
        for name, (ms, cnt) in sorted(
                agg.items(), key=lambda kv: -kv[1][0])[:top_n]:
            print(f"{ms:10.2f} ms  x{cnt:<5d} {name[:110]}")


if __name__ == "__main__":
    parse(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 40)
