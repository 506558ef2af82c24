"""Task registry: classification tasks with their label dictionaries.

Mirrors the capability surface of the reference's hard-coded registries
(reference: main.py:443-462, eval.py:122-139, and the 12-task superset in
create_splits_seq.py:16-168). ``treatment_switched`` flips the binary mapping
(reference: eval.py --treatment_switched flag).
"""
from __future__ import annotations

from typing import Dict

from hipt_abmil_atec23_tpu.utils.config import TaskConfig

TASKS: Dict[str, TaskConfig] = {
    "treatment": TaskConfig(
        name="treatment", n_classes=2,
        label_dict={"invalid": 0, "effective": 1}),
    "treatment_switched": TaskConfig(
        name="treatment_switched", n_classes=2,
        label_dict={"invalid": 1, "effective": 0}),
    "ovarian_5class": TaskConfig(
        name="ovarian_5class", n_classes=5,
        label_dict={"high_grade": 0, "low_grade": 1, "clear_cell": 2,
                    "endometrioid": 3, "mucinous": 4}),
    "ovarian_1vsall": TaskConfig(
        name="ovarian_1vsall", n_classes=2,
        label_dict={"high_grade": 0, "low_grade": 1, "clear_cell": 1,
                    "endometrioid": 1, "mucinous": 1}),
    "nsclc": TaskConfig(
        name="nsclc", n_classes=2,
        label_dict={"luad": 0, "lusc": 1}),
}


def get_task(name: str) -> TaskConfig:
    if name not in TASKS:
        raise KeyError(
            f"unknown task {name!r}; registered: {sorted(TASKS)}")
    return TASKS[name]


def register_task(cfg: TaskConfig) -> None:
    TASKS[cfg.name] = cfg
