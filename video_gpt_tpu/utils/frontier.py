"""Shared loader for the committed serving-schedule drift artifacts.

artifacts/drift_frontier_*.jsonl mixes row types: plain-teacher schedule
rows (``schedule: "steps=..."``), distilled-student rows
(``studentN@N...``), guided-student rows (``gstudentN@N``) and
diagnostics (``teacher_noCFG@10``) — and the fewer-step rows are measured
against a different reference trajectory (the 50-step always-CFG serving
recipe) than the 10-step rows (the 10-step always-CFG trajectory).
Key-matching on (num_steps, uncond_refresh) alone silently conflates
them (a student-vs-teacher50 MSE is not a schedule drift). This loader is
the one place that disentangles rows, so bench.py and bench_suite.py
cannot drift apart in how they read the same file.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

Key = Tuple[int, int, float, Optional[Tuple[float, float]]]


def load_schedule_drift(artifacts_dir: str) -> Dict[Key, dict]:
    """{(num_steps, uncond_refresh, time_shift, cfg_interval): row} for
    PLAIN-TEACHER schedule rows only (no student/diagnostic rows).

    Iterates r04 (randomised-head sweep, scripts/cfg_drift.py) first so
    r05 rows (TRAINED weights, scripts/quality_protocol.py) overwrite
    matching keys. Each row keeps its ``reference`` (r04 rows, which
    predate the field, are tagged "10-step always-CFG" — the sweep's
    semantics) so consumers can report which trajectory the drift is
    against instead of mislabeling 50-step-reference numbers as
    vs-10-step drift.
    """
    out: Dict[Key, dict] = {}
    for name in ("drift_frontier_r04.jsonl", "drift_frontier_r05.jsonl"):
        try:
            with open(os.path.join(artifacts_dir, name)) as f:
                for line in f:
                    row = json.loads(line)
                    sched = row.get("schedule", "")
                    # r04 rows carry no schedule label; r05 teacher rows
                    # are "steps=...". Student/diagnostic rows are not
                    # schedule drift — skip them here.
                    if sched and not sched.startswith("steps="):
                        continue
                    row.setdefault("reference", "10-step always-CFG")
                    key = (row["num_steps"], row["uncond_refresh"],
                           row.get("time_shift", 1.0),
                           tuple(row["cfg_interval"])
                           if row.get("cfg_interval") else None)
                    out[key] = row
        except OSError:
            continue
    return out


def load_student_quality(artifacts_dir: str) -> Dict[str, float]:
    """{schedule_label: rel_final_latent_mse} for distilled-student rows
    (``studentN@...`` and ``gstudentN@...``) — each measured against the
    teacher's 50-step always-CFG reference through trained weights."""
    out: Dict[str, float] = {}
    try:
        with open(os.path.join(artifacts_dir,
                               "drift_frontier_r05.jsonl")) as f:
            for line in f:
                row = json.loads(line)
                sched = row.get("schedule", "")
                if sched.startswith(("student", "gstudent")):
                    out[sched] = row["rel_final_latent_mse"]
    except OSError:
        pass
    return out
