#!/usr/bin/env python3
"""Generate a REFERENCE-DERIVED golden for the AVA AP metric.

Extracts merge_groundtruth_and_predictions / calculate_precision_recall /
compute_average_precision from the reference's
utils/get_ava_active_speaker_performance.py (pure numpy+pandas) and runs
them on deterministic fixtures, writing the resulting AP values to
src/test/resources/ref_ap_golden.json. RefGoldenSpec rebuilds the same
fixtures in Scala and pins graft's AP plans against these numbers.

The only shim: np.float (removed in numpy>=1.24) is aliased back to
np.float64 before exec'ing the reference source — a runtime-compat
patch, not a semantic change. Scores are constructed tie-free because
pandas sort_values is not stable and the reference has no tie-break.
"""
import json
import numpy as np
import pandas as pd

np.float = np.float64  # numpy>=1.24 compat for the reference's dtype check
np.NAN = np.nan if not hasattr(np, "NAN") else np.NAN

SRC = "/root/reference/utils/get_ava_active_speaker_performance.py"
text = open(SRC).read()
# keep only the function defs we need (skip matplotlib import and main)
start = text.index("def compute_average_precision")
end = text.index("def run_evaluation")
ns = {"np": np, "pd": pd, "logging": __import__("logging")}
exec(compile(text[start:end], SRC, "exec"), ns)

SPEAK, NOT = "SPEAKING_AUDIBLE", "NOT_SPEAKING"


def fixture(n, pos_mod, seed_a):
    """uid i in 0..n-1; unique tie-free scores via a multiplicative perm;
    gt positive iff (i*7) % pos_mod == 0; pred label always SPEAKING."""
    rows_g, rows_p = [], []
    for i in range(n):
        uid = f"u{i:05d}"
        box = dict(entity_box_x1=0.1, entity_box_y1=0.2,
                   entity_box_x2=0.3, entity_box_y2=0.4)
        score = ((i * seed_a + 3) % n) / float(n)  # unique for gcd(seed_a,n)=1
        rows_g.append(dict(uid=uid, label=SPEAK if (i * 7) % pos_mod == 0 else NOT, **box))
        rows_p.append(dict(uid=uid, label=SPEAK, score=score, **box))
    g = pd.DataFrame(rows_g)
    p = pd.DataFrame(rows_p)
    return g, p


def ref_ap(g, p):
    merged = ns["merge_groundtruth_and_predictions"](g, p)
    precision, recall = ns["calculate_precision_recall"](merged)
    return float(ns["compute_average_precision"](precision, recall))


cases = []
for (n, pos_mod, seed_a) in [(500, 3, 7), (500, 5, 13), (200, 2, 9), (333, 4, 11)]:
    g, p = fixture(n, pos_mod, seed_a)
    cases.append(dict(n=n, pos_mod=pos_mod, seed_a=seed_a, ap=ref_ap(g, p)))
    print(cases[-1])

out = "src/test/resources/ref_ap_golden.json"
import os
os.makedirs(os.path.dirname(out), exist_ok=True)
json.dump(cases, open(out, "w"), indent=1)
print("wrote", out)
