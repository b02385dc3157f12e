"""Hyperparameter sweeps.

The reference drives a wandb Bayesian sweep over dropout/regularizer/filters
grids, 50 runs, minimizing test_AFLW2000_mae (Model-96/sweep.yaml:1-13).  This
module runs the same search locally (no service dependency): random search,
full grid, or a lightweight Bayesian-style explore/exploit strategy (random
warmup, then mutate top performers).  Sweep definitions load from wandb-schema
YAML/JSON files, so the reference's sweep.yaml works as-is.
"""
from __future__ import annotations

import dataclasses
import itertools
import json
import random
from typing import Any, Callable

from .config import TrainConfig

__all__ = ["SweepConfig", "load_sweep_file", "run_sweep", "SweepResult"]


@dataclasses.dataclass
class SweepConfig:
    parameters: dict[str, list[Any]]
    metric: str = "test_aflw2000_mae"
    goal: str = "minimize"
    method: str = "bayes"   # random | grid | bayes
    num_runs: int = 50
    seed: int = 0
    warmup: int = 8         # random runs before exploit phase (bayes method)


def load_sweep_file(path: str) -> SweepConfig:
    """Load a wandb-schema sweep file (method/metric/parameters.values)."""
    if path.endswith((".yaml", ".yml")):
        import yaml
        with open(path) as f:
            raw = yaml.safe_load(f)
    else:
        with open(path) as f:
            raw = json.load(f)
    params = {k: v["values"] for k, v in raw["parameters"].items()}
    metric = raw.get("metric", {})
    return SweepConfig(
        parameters=params,
        metric=metric.get("name", "test_aflw2000_mae"),
        goal=metric.get("goal", "minimize"),
        method=raw.get("method", "bayes"),
        num_runs=int(raw.get("run_cap", raw.get("num_runs", 50))),
    )


@dataclasses.dataclass
class SweepResult:
    runs: list[dict[str, Any]]           # [{params, metrics, objective}]
    best: dict[str, Any]

    def top(self, k: int = 5) -> list[dict[str, Any]]:
        return sorted(self.runs, key=lambda r: r["objective"])[:k]


def _sample_random(rng: random.Random, grids: dict[str, list]) -> dict:
    return {k: rng.choice(v) for k, v in grids.items()}


def _mutate(rng: random.Random, base: dict, grids: dict[str, list]) -> dict:
    out = dict(base)
    key = rng.choice(list(grids))
    out[key] = rng.choice(grids[key])
    return out


def run_sweep(sweep: SweepConfig,
              objective_fn: Callable[[dict[str, Any]], dict[str, float]],
              base_config: TrainConfig | None = None) -> SweepResult:
    """Run a sweep.  objective_fn maps a parameter assignment to a metrics
    dict containing sweep.metric (typically: build TrainConfig, fit, eval).

    The 'bayes' method is explore/exploit: `warmup` random configs, then each
    step either explores (p=0.3) or mutates one axis of a random top-3 config —
    a simple, dependency-free stand-in for wandb's GP search over the same
    discrete grids.
    """
    rng = random.Random(sweep.seed)
    sign = 1.0 if sweep.goal == "minimize" else -1.0
    runs: list[dict[str, Any]] = []
    seen: set[tuple] = set()

    if sweep.method == "grid":
        keys = sorted(sweep.parameters)
        candidates = [dict(zip(keys, vs))
                      for vs in itertools.product(*(sweep.parameters[k] for k in keys))]
        plan = candidates[:sweep.num_runs]
    else:
        plan = None

    space = 1
    for v in sweep.parameters.values():
        space *= len(v)

    for i in range(sweep.num_runs):
        if plan is not None:
            if i >= len(plan):
                break
            assignment = plan[i]
        else:
            # draw until unseen (bounded) — duplicate configurations would
            # burn a full training run each; stop early if the grid is spent
            if len(seen) >= space:
                break
            assignment = None
            for _ in range(64):
                if (sweep.method == "bayes" and i >= sweep.warmup and runs
                        and rng.random() > 0.3):
                    top = sorted(runs, key=lambda r: r["objective"])[:3]
                    cand = _mutate(rng, rng.choice(top)["params"],
                                   sweep.parameters)
                else:
                    cand = _sample_random(rng, sweep.parameters)
                if tuple(sorted(cand.items())) not in seen:
                    assignment = cand
                    break
            if assignment is None:
                continue  # couldn't find a fresh config this round

        key = tuple(sorted(assignment.items()))
        seen.add(key)

        metrics = objective_fn(assignment)
        objective = sign * float(metrics[sweep.metric])
        runs.append({"params": assignment, "metrics": metrics,
                     "objective": objective})

    best = min(runs, key=lambda r: r["objective"])
    return SweepResult(runs=runs, best=best)
