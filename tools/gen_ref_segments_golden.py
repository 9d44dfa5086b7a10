#!/usr/bin/env python3
"""Generate a REFERENCE-DERIVED golden for speaking-segment extraction.

Exec-extracts find_speaking_segments from the reference's
extractSpeakingSegments.py (self-contained pure Python) and applies the
script's own min-duration filter (extractSpeakingSegments.py:99-100:
min_frames = int(minDuration * 25); keep (e - s) >= min_frames) to
deterministic score arrays. RefGoldenSpec rebuilds the same score
series in Scala and pins SpeakingSegments.extract against the
resulting (start, end) pairs.
"""
import json
import math
import os
import numpy

SRC = "/root/reference/extractSpeakingSegments.py"
text = open(SRC).read()
start = text.index("def find_speaking_segments")
end = text.index("def extract_segment")
ns = {"numpy": numpy}
exec(compile(text[start:end], SRC, "exec"), ns)


def scores(n, case):
    """Deterministic series; mirrored exactly in Scala (same IEEE ops)."""
    if case == "sin":
        return [math.sin(i * 0.37) * 2 + 0.1 for i in range(n)]
    if case == "trailing":  # speaking run continues to the very end
        return [(-1.0 if i < n - 20 else 1.0) for i in range(n)]
    if case == "all_on":
        return [1.0] * n
    if case == "all_off":
        return [-1.0] * n
    raise ValueError(case)


cases = []
for case in ["sin", "trailing", "all_on", "all_off"]:
    for threshold, min_duration in [(0.0, 0.5), (0.0, 0.2), (0.5, 0.2)]:
        arr = numpy.array(scores(120, case))
        segs = ns["find_speaking_segments"](arr, threshold)
        min_frames = int(min_duration * 25)  # :99
        kept = [(s, e) for s, e in segs if (e - s) >= min_frames]  # :100
        cases.append(dict(case=case, n=120, threshold=threshold,
                          min_duration=min_duration,
                          segments=[[int(s), int(e)] for s, e in kept]))
        print(cases[-1])

dest = "src/test/resources/ref_segments_golden.json"
os.makedirs(os.path.dirname(dest), exist_ok=True)
json.dump(cases, open(dest, "w"))
print("wrote", dest)
