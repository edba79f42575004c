"""Native hyperparameter search (the reference's optuna stand-in).

The reference drives HPO through an optuna study with trial.suggest_* calls
and a MedianPruner (reference: train.py:46-145).  This module provides the
same working surface — ``Trial.suggest_int/float/categorical``, a ``Study``
with ``optimize(objective, n_trials, catch=...)``, and median pruning via
``trial.report`` / ``trial.should_prune`` — as a dependency-free random
search.  Objectives and trainers run jitted on TPU; the search loop is host
Python.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np


class TrialPruned(Exception):
    """Raised by objectives that honor pruning."""


@dataclass
class Trial:
    number: int
    rng: np.random.Generator
    study: "Study"
    params: dict = field(default_factory=dict)
    intermediate: dict = field(default_factory=dict)
    user_attrs: dict = field(default_factory=dict)

    def set_user_attr(self, name: str, value) -> None:
        """Attach a side metric to the trial (optuna's set_user_attr) —
        e.g. the TEST metric of a trial whose objective is the VAL metric,
        so hyperparameter selection never sees the test set."""
        self.user_attrs[name] = value

    def suggest_int(self, name: str, low: int, high: int, log: bool = False) -> int:
        if log:
            v = int(round(math.exp(
                self.rng.uniform(math.log(low), math.log(high))
            )))
            v = min(max(v, low), high)
        else:
            v = int(self.rng.integers(low, high + 1))
        self.params[name] = v
        return v

    def suggest_float(
        self, name: str, low: float, high: float, log: bool = False
    ) -> float:
        if log:
            v = float(np.exp(self.rng.uniform(np.log(low), np.log(high))))
        else:
            v = float(self.rng.uniform(low, high))
        self.params[name] = v
        return v

    def suggest_categorical(self, name: str, choices: list):
        v = choices[int(self.rng.integers(len(choices)))]
        self.params[name] = v
        return v

    # -- median pruning ------------------------------------------------------

    def report(self, value: float, step: int) -> None:
        self.intermediate[step] = value

    def should_prune(self) -> bool:
        if not self.intermediate:
            return False
        step = max(self.intermediate)
        peers = [
            t.intermediate[step]
            for t in self.study.trials
            if t is not self and step in t.intermediate
        ]
        if len(peers) < self.study.n_startup_trials:
            return False
        return self.intermediate[step] > float(np.median(peers))


@dataclass
class FrozenTrial:
    number: int
    value: Optional[float]
    params: dict
    state: str  # "complete" | "pruned" | "failed"
    intermediate: dict
    user_attrs: dict = field(default_factory=dict)


class Study:
    """Random-search study with median pruning (minimize)."""

    def __init__(self, seed: int = 0, n_startup_trials: int = 2):
        self.rng = np.random.default_rng(seed)
        self.trials: list[Trial] = []
        self.results: list[FrozenTrial] = []
        self.n_startup_trials = n_startup_trials

    def optimize(
        self,
        objective: Callable[[Trial], float],
        n_trials: int,
        catch: tuple = (),
    ) -> None:
        for i in range(n_trials):
            trial = Trial(
                number=len(self.trials),
                rng=np.random.default_rng(self.rng.integers(2**32)),
                study=self,
            )
            self.trials.append(trial)
            try:
                value = float(objective(trial))
                state = "complete"
            except TrialPruned:
                value, state = None, "pruned"
            except catch:
                value, state = None, "failed"
            self.results.append(
                FrozenTrial(
                    trial.number, value, dict(trial.params), state,
                    dict(trial.intermediate), dict(trial.user_attrs),
                )
            )

    @property
    def best_trial(self) -> FrozenTrial:
        done = [t for t in self.results if t.state == "complete"]
        if not done:
            raise ValueError("no completed trials")
        return min(done, key=lambda t: t.value)

    @property
    def best_value(self) -> float:
        return self.best_trial.value

    @property
    def best_params(self) -> dict:
        return self.best_trial.params
