"""Omni meta-datasets: weighted sampling over sub-datasets and alternating
task scheduling.

Reference: unicorn/data/datasets/omni_data.py:6-84 (OmniDataset,
OmniDatasetPlus). All sub-datasets expose
`pull_item_omni(seq_id, num_frames) -> list[(img, labels)]` returning
`num_frames` frames of (HWC uint8 image, (N, 5|6) [xyxy, cls(, tid)]).
"""
from __future__ import annotations

import random
from typing import Sequence


class OmniDataset:
    """Weighted sampling over sub-datasets with a fixed samples_per_epoch
    (omni_data.py:6-34)."""

    def __init__(self, datasets: Sequence, p_datasets=None,
                 samples_per_epoch: int = 200000, num_frames: int = 2):
        self.datasets = list(datasets)
        if p_datasets is None:
            p_datasets = [len(d) for d in self.datasets]
        total = sum(p_datasets)
        self.p_datasets = [p / total for p in p_datasets]
        self.samples_per_epoch = samples_per_epoch
        self.num_frames = num_frames

    def __len__(self):
        return self.samples_per_epoch

    def sample_spec(self, index):
        """Draw (sub-dataset, seq_id) without touching disk. The loader calls
        this under its sampler lock and load_spec OUTSIDE it, so image decode
        runs in parallel across workers while RNG draws stay serialized."""
        ds = random.choices(self.datasets, self.p_datasets)[0]
        return ds, random.randint(0, len(ds) - 1)

    def load_spec(self, spec):
        ds, seq_id = spec
        return ds.pull_item_omni(seq_id, self.num_frames)

    def pull_item(self, index):
        return self.load_spec(self.sample_spec(index))


class OmniDatasetPlus:
    """Task-level meta dataset: joint or alternating SOT<->MOT sampling
    (omni_data.py:37-84). task_id 1 = SOT/VOS, 2 = MOT/MOTS."""

    def __init__(self, sot_dataset=None, mot_dataset=None,
                 samples_per_epoch: int = 200000, mode: str = "alter",
                 mot_weight: float = 0.5):
        assert mode in ("joint", "alter")
        self.sot_dataset = sot_dataset
        self.mot_dataset = mot_dataset
        self.samples_per_epoch = samples_per_epoch
        self.mode = mode
        self.mot_weight = mot_weight
        self.cur_task = 1  # alternating state, driven by the trainer

    def __len__(self):
        return self.samples_per_epoch

    def alter_task(self):
        """Flip the active task (called by the trainer every alter_step iters,
        reference trainer.py:454-460)."""
        self.cur_task = 2 if self.cur_task == 1 else 1

    def sample_spec(self, index):
        """Task + sub-dataset draw only (no disk I/O) — see
        OmniDataset.sample_spec for the lock split contract."""
        if self.sot_dataset is None:       # MOT-only ablation
            task = 2
        elif self.mot_dataset is None:     # SOT-only ablation
            task = 1
        elif self.mode == "joint":
            task = 2 if random.random() < self.mot_weight else 1
        else:
            task = self.cur_task
        ds = self.sot_dataset if task == 1 else self.mot_dataset
        inner = ds.sample_spec(index) if hasattr(ds, "sample_spec") else None
        return ds, inner, task

    def load_spec(self, spec):
        ds, inner, task = spec
        frames = ds.load_spec(inner) if inner is not None else ds.pull_item(0)
        return frames, task

    def pull_item(self, index):
        return self.load_spec(self.sample_spec(index))
