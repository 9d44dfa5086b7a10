#!/usr/bin/env python3
"""Generate a REFERENCE-DERIVED golden for the greedy face tracker.

Exec-extracts bb_intersection_over_union + track_shot from the
reference's demoTalkNet.py and runs the REAL loop — including the
CPython remove-during-iteration semantics TrackerSpec pins by hand —
on a deterministic fixture, writing the resulting tracks to
src/test/resources/ref_tracker_golden.json. RefGoldenSpec rebuilds the
same fixture in Scala and pins Tracker.trackScene against it.

Shim: scipy.interpolate.interp1d is replaced with numpy.interp (same
linear interpolation on interior points; the fixture avoids duplicate
frames within a track so their duplicate-x edge cases never differ).
"""
import json
import os
import re
import numpy

SRC = "/root/reference/demoTalkNet.py"
text = open(SRC).read()
start = text.index("def bb_intersection_over_union")
end = text.index("def crop_video")


class Interp1dShim:
    def __init__(self, x, y):
        self.x, self.y = numpy.asarray(x, dtype=float), numpy.asarray(y, dtype=float)

    def __call__(self, xi):
        return numpy.interp(xi, self.x, self.y)


ns = {"numpy": numpy, "interp1d": Interp1dShim}
exec(compile(text[start:end], SRC, "exec"), ns)


class Args:
    numFailedDet = 10
    minTrack = 11
    minFaceSize = 1.0


def fixture():
    """Frames 0..99; faces in list order A,B,C,D where present:
    A drifts right, absent when f%17==0 (dropout → interpolation);
    B drifts left on frames 5..80; C is sub-minFaceSize on 0..40;
    D is a short 9-frame track (fails minTrack)."""
    scene = []
    for f in range(100):
        faces = []
        if f % 17 != 0:
            faces.append({"frame": f, "bbox": [10 + 0.5 * f, 20.0, 30 + 0.5 * f, 40.0]})
        if 5 <= f <= 80:
            faces.append({"frame": f, "bbox": [200 - 0.3 * f, 50.0, 220 - 0.3 * f, 70.0]})
        if f <= 40:
            faces.append({"frame": f, "bbox": [300.0, 300.0, 300.8, 300.8]})
        if 50 <= f <= 58:
            faces.append({"frame": f, "bbox": [400.0 + f, 400.0, 430.0 + f, 430.0]})
        scene.append(faces)
    return scene


tracks = ns["track_shot"](Args(), fixture())
out = [{"frames": t["frame"].tolist(),
        "bbox": [[float(v) for v in row] for row in t["bbox"]]} for t in tracks]
print(f"{len(out)} tracks: " + ", ".join(f"{len(t['frames'])} frames" for t in out))

dest = "src/test/resources/ref_tracker_golden.json"
os.makedirs(os.path.dirname(dest), exist_ok=True)
json.dump(out, open(dest, "w"))
print("wrote", dest)
