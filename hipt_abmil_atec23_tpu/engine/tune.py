"""Hyperparameter search: ASHA successive halving + plateau stopping.

Capability parity with the reference's Ray Tune integration (reference:
main.py:40-268 — grid/loguniform search spaces, ASHAScheduler on val loss,
CLIReporter, per-epoch tune.report + checkpoints, TrialPlateauStopper at
utils/tuning_utils.py:10-105, best-config selection by the average of the
last 10 epochs' val loss at main.py:256-268) without Ray: trials are plain
training runs with an in-process scheduler. Each trial trains via the jitted
engine; the ASHA rungs kill underperformers at epoch milestones.
"""
from __future__ import annotations

import dataclasses
import json
import math
import os
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd


# --------------------------------------------------------------------------
# search spaces (reference: main.py:54-206)
# --------------------------------------------------------------------------

@dataclass
class Uniform:
    low: float
    high: float

    def sample(self, rng):
        return float(rng.uniform(self.low, self.high))


@dataclass
class LogUniform:
    low: float
    high: float

    def sample(self, rng):
        return float(np.exp(rng.uniform(np.log(self.low), np.log(self.high))))


@dataclass
class Choice:
    values: Sequence[Any]

    def sample(self, rng):
        return self.values[int(rng.integers(len(self.values)))]


@dataclass
class GridSearch:
    values: Sequence[Any]


# The reference's main tuning space (reference: main.py:95-106 style):
DEFAULT_SEARCH_SPACE: Dict[str, Any] = {
    "lr": LogUniform(1e-5, 1e-2),
    "reg": LogUniform(1e-5, 1e-1),
    "drop_out": Uniform(0.0, 0.9),
    "max_patches_per_slide": Choice([50, 75, 100, 150, 300]),
    "model_size": Choice(["hipt_smallest", "hipt_smaller", "hipt_small",
                          "hipt_medium", "hipt_big"]),
    "B": Choice([4, 8, 16]),
}


def sample_configs(space: Dict[str, Any], num_samples: int,
                   seed: int = 0) -> List[Dict[str, Any]]:
    """Random samples crossed with any GridSearch axes (Ray semantics:
    grid axes are exhaustive per sample)."""
    rng = np.random.default_rng(seed)
    grid_axes = {k: v.values for k, v in space.items()
                 if isinstance(v, GridSearch)}
    rand_axes = {k: v for k, v in space.items()
                 if not isinstance(v, GridSearch)}

    def grid_product():
        if not grid_axes:
            yield {}
            return
        keys = list(grid_axes)
        idx = [0] * len(keys)
        while True:
            yield {k: grid_axes[k][i] for k, i in zip(keys, idx)}
            for j in range(len(keys) - 1, -1, -1):
                idx[j] += 1
                if idx[j] < len(grid_axes[keys[j]]):
                    break
                idx[j] = 0
            else:
                return

    configs = []
    for _ in range(num_samples):
        base = {k: v.sample(rng) for k, v in rand_axes.items()}
        for g in grid_product():
            configs.append({**base, **g})
    return configs


# --------------------------------------------------------------------------
# stoppers / scheduler
# --------------------------------------------------------------------------

class TrialPlateauStopper:
    """Stop a trial when the metric's std over a window falls below
    `std` (plateau) OR the windowed mean is rising (reference:
    utils/tuning_utils.py:10-105, customized with mean-rise detection)."""

    def __init__(self, std: float = 0.001, num_results: int = 4,
                 grace_period: int = 4, metric_threshold: Optional[float] = None,
                 mode: str = "min"):
        self.std = std
        self.num_results = num_results
        self.grace_period = grace_period
        self.metric_threshold = metric_threshold
        self.mode = mode
        self._values: List[float] = []
        self._prev_mean: Optional[float] = None

    def __call__(self, value: float) -> bool:
        self._values.append(value)
        n = len(self._values)
        if n < self.grace_period or n < self.num_results:
            return False
        if self.metric_threshold is not None:
            if self.mode == "min" and min(self._values) > self.metric_threshold:
                return True
            if self.mode == "max" and max(self._values) < self.metric_threshold:
                return True
        window = self._values[-self.num_results:]
        mean = float(np.mean(window))
        if float(np.std(window)) < self.std:
            return True
        if self._prev_mean is not None:
            rising = mean > self._prev_mean
            if (self.mode == "min" and rising) or \
               (self.mode == "max" and not rising):
                self._rise_count = getattr(self, "_rise_count", 0) + 1
                if self._rise_count >= self.num_results:
                    return True
            else:
                self._rise_count = 0
        self._prev_mean = mean
        return False


class ASHAScheduler:
    """Asynchronous successive halving on epoch milestones (reference:
    ASHAScheduler(metric='loss', mode='min'), main.py:209-214)."""

    def __init__(self, max_t: int = 100, grace_period: int = 8,
                 reduction_factor: int = 2, mode: str = "min"):
        self.mode = mode
        self.rungs: List[int] = []
        t = grace_period
        while t < max_t:
            self.rungs.append(t)
            t *= reduction_factor
        self.reduction_factor = reduction_factor
        self._rung_records: Dict[int, List[float]] = {r: [] for r in self.rungs}

    def should_stop(self, epoch: int, value: float) -> bool:
        if epoch not in self._rung_records:
            return False
        rec = self._rung_records[epoch]
        rec.append(value)
        if len(rec) < self.reduction_factor:
            return False  # not enough peers yet; let it continue
        v = np.asarray(rec)
        q = 1.0 / self.reduction_factor
        cutoff = np.quantile(v, q if self.mode == "min" else 1 - q)
        return value > cutoff if self.mode == "min" else value < cutoff


# --------------------------------------------------------------------------
# tuner
# --------------------------------------------------------------------------

@dataclass
class TrialResult:
    config: Dict[str, Any]
    history: List[Dict[str, float]]
    stopped_epoch: int
    best_metric: float
    last10_mean_loss: float


def apply_trial_config(cfg, trial: Dict[str, Any]):
    """Override experiment config fields from a trial dict (reference:
    core_utils_tuning.py:99-111)."""
    cfg = dataclasses.replace(cfg)
    model = dataclasses.replace(cfg.model)
    train = dataclasses.replace(cfg.train)
    bags = dataclasses.replace(cfg.bags)
    for k, v in trial.items():
        if k in ("lr", "reg", "bag_weight"):
            train = dataclasses.replace(train, **{k: float(v)})
        elif k == "drop_out":
            model = dataclasses.replace(model, drop_out=float(v))
        elif k == "model_size":
            model = dataclasses.replace(model, model_size=str(v))
        elif k == "B":
            model = dataclasses.replace(model, k_sample=int(v))
        elif k == "max_patches_per_slide":
            bags = dataclasses.replace(bags, max_patches_per_slide=int(v))
        else:
            raise KeyError(f"unknown tunable {k!r}")
    return dataclasses.replace(cfg, model=model, train=train, bags=bags)


def run_tuning(
    base_cfg,
    fold_datasets: Tuple,
    class_counts: np.ndarray,
    *,
    space: Optional[Dict[str, Any]] = None,
    num_samples: int = 20,
    max_epochs: Optional[int] = None,
    grace_period: int = 8,
    reduction_factor: int = 2,
    use_plateau_stopper: bool = True,
    seed: int = 0,
    output_csv: Optional[str] = None,
    verbose: bool = True,
    checkpoint_trials: bool = False,
    max_ckpts_to_keep: int = 2,
    resume: bool = False,
) -> Tuple[Dict[str, Any], pd.DataFrame, List[TrialResult]]:
    """Search over `space`; returns (best_config, results_df, trials).

    Best config = lowest mean val loss over the trial's last 10 epochs
    (reference: main.py:256-268). With ``checkpoint_trials`` each trial
    writes per-epoch orbax train-state checkpoints (params + optimizer)
    under ``<trial_dir>/ckpts`` — the reference saves the same per epoch
    under Ray's tune.checkpoint_dir (core_utils_tuning.py:235-240).

    ``resume=True`` is the Tuner.restore analog (reference: main.py:259-263):
    completed trials are re-read from ``output_csv`` (config sampling is
    prefix-stable in the seed) and only the remaining trials run. ASHA rung
    statistics from the prior process are not replayed — resumed searches
    early-kill slightly more conservatively.
    """
    from hipt_abmil_atec23_tpu.engine.train import train_fold

    space = space or DEFAULT_SEARCH_SPACE
    configs = sample_configs(space, num_samples, seed)
    max_t = max_epochs or base_cfg.train.max_epochs
    asha = ASHAScheduler(max_t=max_t, grace_period=grace_period,
                         reduction_factor=reduction_factor)
    train_ds, val_ds, test_ds = fold_datasets

    trials: List[TrialResult] = []
    rows = []
    done = 0
    if resume and output_csv and os.path.exists(output_csv):
        rows = pd.read_csv(output_csv).to_dict("records")
        done = len(rows)
        if verbose and done:
            print(f"[tune] resume: {done} completed trials from {output_csv}")
    for ti, trial in enumerate(configs):
        if ti < done:
            continue
        cfg = apply_trial_config(base_cfg, trial)
        cfg = dataclasses.replace(
            cfg, exp_code=f"{base_cfg.exp_code}_t{ti}",
            results_dir=os.path.join(base_cfg.results_dir, f"trial_{ti}"),
            train=dataclasses.replace(cfg.train, max_epochs=max_t,
                                      early_stopping=False))
        plateau = TrialPlateauStopper() if use_plateau_stopper else None

        def cb(epoch, rec, _plateau=plateau):
            val = rec["val_loss"]
            # returning True aborts the trial's epoch loop (train_fold honors it)
            return asha.should_stop(epoch, val) or \
                bool(_plateau and _plateau(val))

        ckptr = None
        if checkpoint_trials:
            from hipt_abmil_atec23_tpu.engine.checkpoint import (
                TrainStateCheckpointer)
            ckptr = TrainStateCheckpointer(
                os.path.join(cfg.results_dir, "ckpts"),
                max_to_keep=max_ckpts_to_keep)
        try:
            res = train_fold(cfg, 0, train_ds, val_ds, test_ds, class_counts,
                             verbose=False, log_cb=cb,
                             state_cb=ckptr.save if ckptr else None)
        finally:
            if ckptr is not None:
                ckptr.close()
        hist = res.history
        losses = [h["val_loss"] for h in hist]
        last10 = float(np.mean(losses[-10:]))
        trials.append(TrialResult(config=trial, history=hist,
                                  stopped_epoch=len(hist) - 1,
                                  best_metric=float(np.min(losses)),
                                  last10_mean_loss=last10))
        rows.append({**trial, "epochs": len(hist), "best_val_loss":
                     float(np.min(losses)), "last10_val_loss": last10,
                     "final_val_auc": hist[-1]["val_auc"]})
        if verbose:
            print(f"[tune] trial {ti}: {trial} -> last10 {last10:.4f} "
                  f"({len(hist)} epochs)")
        if output_csv:
            pd.DataFrame(rows).to_csv(output_csv, index=False)

    df = pd.DataFrame(rows)
    # select over ALL rows (incl. resumed ones); rows are in config order,
    # but a resumed CSV may hold MORE rows than this call's num_samples —
    # fall back to the CSV's own config columns then.
    best_idx = int(np.argmin(df["last10_val_loss"].values))
    if best_idx < len(configs):
        best = configs[best_idx]
    else:
        best = {k: df.iloc[best_idx][k] for k in space if k in df.columns}
    return best, df, trials


# --------------------------------------------------------------------------
# eval-time sampling-parameter search (reference: eval.py:172-227 tunes DRAS
# parameters with Ray at evaluation time)
# --------------------------------------------------------------------------

SAMPLING_SEARCH_SPACE: Dict[str, Any] = {
    "weight_smoothing": LogUniform(1e-4, 0.5),
    "resampling_iterations": Choice([2, 4, 6, 8, 10, 12, 16]),
    "sampling_neighbors": Choice([4, 8, 16, 32, 64]),
    "sampling_random": Uniform(0.25, 0.95),
    "sampling_random_delta": LogUniform(1e-4, 0.5),
}


def tune_sampling_params(
    cfg, ds, params, model, *, coords_lookup,
    space: Optional[Dict[str, Any]] = None,
    num_samples: int = 20, seed: int = 0,
    output_csv: Optional[str] = None, verbose: bool = True,
) -> Tuple[Dict[str, Any], pd.DataFrame]:
    """Search DRAS sampling parameters against eval AUC on `ds` (typically a
    validation split). Returns (best_params, results_df)."""
    from hipt_abmil_atec23_tpu.engine import metrics as M
    from hipt_abmil_atec23_tpu.engine.sampling import SamplingConfig, eval_sampling

    space = space or SAMPLING_SEARCH_SPACE
    configs = sample_configs(space, num_samples, seed)
    rows = []
    best, best_auc = None, -1.0
    for ti, trial in enumerate(configs):
        scfg = SamplingConfig(**{k: (int(v) if k in (
            "resampling_iterations", "sampling_neighbors") else float(v))
            for k, v in trial.items()})
        probs, counts = eval_sampling(cfg, scfg, ds, params, model,
                                      coords_lookup=coords_lookup,
                                      seed=seed + ti)
        auc = M.auc_score(ds.labels, probs, cfg.task.n_classes)
        rows.append({**trial, "auc": auc,
                     "mean_patches": float(counts.mean())})
        if auc > best_auc:
            best, best_auc = trial, auc
        if verbose:
            print(f"[tune-sampling] {ti}: auc {auc:.4f} {trial}")
        if output_csv:
            pd.DataFrame(rows).to_csv(output_csv, index=False)
    return best, pd.DataFrame(rows)
