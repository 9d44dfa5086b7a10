#!/usr/bin/env python3
"""Golden for q71: the reference's merge → precision/recall → AP chain
run on q71's EXACT gt/pred derivation from events (sf0.001).

Uses the same exec-extract as gen_ref_ap_golden.py. q71's scores are
unique by construction (cents·1e6 + event_id), so the reference's
unstable pandas sort is deterministic and the golden is well-defined.
The reference sums contributions with numpy (pairwise); q71 sums
nano-rounded integers — the spec compares within the n·0.5e-9
quantization bound.
"""
import json
import os
import numpy as np
import pandas as pd

np.float = np.float64
SRC = "/root/reference/utils/get_ava_active_speaker_performance.py"
text = open(SRC).read()
ns = {"np": np, "pd": pd, "logging": __import__("logging")}
exec(compile(text[text.index("def compute_average_precision"):
                  text.index("def run_evaluation")], SRC, "exec"), ns)

SF = "/root/testdata/sf0.001"
ev = pd.read_parquet(f"{SF}/events.parquet")[["user_id", "event_id", "value"]]

# q71's derivation, term for term (RefOps.scala q71_ava_eval_e2e)
ts = (ev.event_id % 400).astype("float64") * 0.25
x1 = (ev.event_id % 64).astype("float64") / 64.0
y1 = (ev.event_id % 32).astype("float64") / 64.0
entity = "u" + ev.user_id.astype(str) + "_e" + ev.event_id.astype(str)
score = (np.round(ev.value.astype("float64") * 100) * 1000000 +
         ev.event_id).astype("float64")
box = dict(entity_box_x1=x1, entity_box_y1=y1,
           entity_box_x2=x1 + 0.25, entity_box_y2=y1 + 0.25)
gt = pd.DataFrame(dict(frame_timestamp=ts, entity_id=entity,
                       label=np.where(ev.event_id % 3 == 0,
                                      "SPEAKING_AUDIBLE", "NOT_SPEAKING"), **box))
pred = pd.DataFrame(dict(frame_timestamp=ts, entity_id=entity,
                         label="SPEAKING_AUDIBLE", score=score, **box))
for df in (gt, pred):  # reference :85 uid derivation
    df["uid"] = df["frame_timestamp"].map(str) + ":" + df["entity_id"]

merged = ns["merge_groundtruth_and_predictions"](gt, pred)
precision, recall = ns["calculate_precision_recall"](merged)
ap = float(ns["compute_average_precision"](precision, recall))
n = int(len(merged))
n_pos = int(ns["get_all_positives"](merged))
print(dict(ap=ap, n=n, n_pos=n_pos))

dest = "src/test/resources/ref_runeval_golden.json"
os.makedirs(os.path.dirname(dest), exist_ok=True)
json.dump(dict(sf=SF, ap=ap, n=n, n_pos=n_pos), open(dest, "w"))
print("wrote", dest)
