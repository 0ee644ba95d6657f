"""Vectorized per-event anomaly scorer (the fraud-scoring analog).

Re-expresses the reference's 17-rule additive fraud UDF — a *per-row*
PySpark UDF (``streaming/spark/fraud_detector.py:221-294``) — as a
single vectorized numpy/Arrow pass per batch: each rule is a boolean
mask contributing points and a flag label; the score is capped at 100
(``fraud_detector.py:294`` ``min(score, 100)``); flags become a
``list<string>`` column (the ``fraud_flags`` ArrayType analog,
``fraud_detector.py:216-219``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nyc_taxi_data_pipeline_ray.stages import replace_column

#: (flag name, points) — rule weights; masks computed in score_batch
RULES = [
    ("empty_text", 25),
    ("giant_text", 10),
    ("night_activity", 5),
    ("negative_gap", 30),
    ("huge_gap", 10),
    ("system_after_start", 20),
    ("tool_role_without_tool", 15),
    ("high_turn_idx", 10),
]

SCORE_COL = "anomaly_score"
FLAGS_COL = "anomaly_flags"


def score_batch(batch: pa.Table) -> pa.Table:
    """map_batches stage; requires ``conv_id,turn_idx,role,text,tool,ts``.

    ``negative_gap``/``huge_gap`` compare ``ts`` of adjacent rows *within
    the batch for the same conversation* — exact when upstream is
    key-partitioned and sorted (as lake snapshots are), heuristic
    otherwise, mirroring the reference's per-batch statelessness.
    """
    n = batch.num_rows
    text = pc.fill_null(batch["text"], "")
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False)
    role = batch["role"].to_numpy(zero_copy_only=False)
    tool = batch["tool"]
    turn = batch["turn_idx"].to_numpy(zero_copy_only=False)
    hour = pc.hour(batch["ts"]).to_numpy(zero_copy_only=False)
    ts_us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    conv = batch["conv_id"].to_numpy(zero_copy_only=False)

    same_conv = np.concatenate([[False], conv[1:] == conv[:-1]]) if n else np.array([], bool)
    gap_us = np.concatenate([[0], np.diff(ts_us)]) if n else np.array([], np.int64)

    masks = {
        "empty_text": (n_chars == 0) & (role != None) & (np.asarray(role, object) != "tool"),  # noqa: E711
        "giant_text": n_chars > 1900,
        "night_activity": (hour >= 22) | (hour < 6),
        "negative_gap": same_conv & (gap_us < 0),
        "huge_gap": same_conv & (gap_us > 3_600_000_000),
        "system_after_start": (np.asarray(role, object) == "system") & (turn > 0),
        "tool_role_without_tool": (np.asarray(role, object) == "tool")
        & ~tool.is_valid().to_numpy(zero_copy_only=False),
        "high_turn_idx": turn >= 1000,
    }

    mask_mat = np.stack([masks[name].astype(bool) for name, _ in RULES], axis=1)  # (n, R)
    points = np.array([p for _, p in RULES], np.int32)
    score = np.minimum(mask_mat @ points, 100).astype(np.int32)
    # list<string> flags built straight from the mask matrix: np.nonzero
    # in row-major order IS the per-row rule order, so offsets + gathered
    # names form the ListArray with no per-hit Python append loop
    _, rule_nz = np.nonzero(mask_mat)
    offsets = np.concatenate([[0], np.cumsum(mask_mat.sum(axis=1))]).astype(np.int32)
    names = np.array([name for name, _ in RULES], object)
    flag_col = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(names[rule_nz], pa.string())
    )

    out = replace_column(batch, SCORE_COL, pa.array(score, pa.int32()))
    return replace_column(out, FLAGS_COL, flag_col)
