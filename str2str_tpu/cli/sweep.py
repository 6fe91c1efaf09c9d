"""Hyperparameter sweep CLI: random / grid search over config overrides.

First-party equivalent of the reference's Optuna sweeper
(`/root/reference/configs/hparams_search/optuna.yaml:17-51`; optuna itself
is not in this image): runs `cli.train` repeatedly with sampled overrides,
optimizes a monitored metric, and writes a trials CSV + the best config.

Search-space syntax (one spec per --param, mirroring the hydra-optuna one):
    --param 'model.optimizer.lr=interval(1e-5, 1e-1)'      # log-uniform
    --param 'data.batch_size=choice(1, 2, 4)'
    --param 'trainer.gradient_accumulation=range(1, 4)'    # inclusive ints

Usage:
    python -m str2str_tpu.cli.sweep --n-trials 20 --metric val/loss \
        --direction minimize --param 'model.optimizer.lr=interval(1e-5,1e-1)' \
        -- trainer.max_epochs=3 data.batch_size=2 [...fixed overrides]
"""
from __future__ import annotations

import argparse
import csv
import json
import math
import re
import sys
from pathlib import Path
from typing import Any, Dict, List

import numpy as np

from ..utils.logging import get_logger

log = get_logger(__name__)


def parse_space(specs: List[str]) -> Dict[str, dict]:
    space = {}
    for spec in specs:
        key, expr = spec.split("=", 1)
        m = re.match(r"interval\(([^,]+),([^)]+)\)$", expr.strip())
        if m:
            lo, hi = float(m.group(1)), float(m.group(2))
            space[key] = {"kind": "interval", "lo": lo, "hi": hi,
                          "log": lo > 0 and hi / lo > 100}
            continue
        m = re.match(r"choice\((.+)\)$", expr.strip())
        if m:
            vals = [v.strip() for v in m.group(1).split(",")]
            space[key] = {"kind": "choice", "values": vals}
            continue
        m = re.match(r"range\(([^,]+),([^)]+)\)$", expr.strip())
        if m:
            space[key] = {"kind": "range", "lo": int(m.group(1)),
                          "hi": int(m.group(2))}
            continue
        raise ValueError(f"unparseable search spec {spec!r}")
    return space


def sample(space: Dict[str, dict], rng: np.random.RandomState) -> Dict[str, Any]:
    out = {}
    for key, s in space.items():
        if s["kind"] == "interval":
            if s["log"]:
                out[key] = float(np.exp(rng.uniform(
                    math.log(s["lo"]), math.log(s["hi"]))))
            else:
                out[key] = float(rng.uniform(s["lo"], s["hi"]))
        elif s["kind"] == "choice":
            out[key] = s["values"][rng.randint(len(s["values"]))]
        else:
            out[key] = int(rng.randint(s["lo"], s["hi"] + 1))
    return out


class TPESampler:
    """First-party Tree-structured Parzen Estimator (adaptive sampler;
    the in-image replacement for the reference's Optuna TPESampler,
    configs/hparams_search/optuna.yaml:17-21).

    Univariate TPE per parameter (Optuna's default independent mode):
    observed trials split into the best `gamma` fraction ("good") and the
    rest; numeric parameters are proposed from a Parzen (gaussian-mixture)
    estimate of the good values and ranked by the density ratio
    l_good(x)/l_bad(x); categorical parameters use smoothed count weights.
    The first `n_startup` trials are random."""

    def __init__(self, space: Dict[str, dict], rng: np.random.RandomState,
                 direction_sign: float, n_startup: int = 8,
                 gamma: float = 0.25, n_candidates: int = 24):
        self.space = space
        self.rng = rng
        self.sign = direction_sign
        self.n_startup = n_startup
        self.gamma = gamma
        self.n_candidates = n_candidates
        self.history: List[tuple] = []   # (params_dict, signed_value)

    def tell(self, params: Dict[str, Any], value: float):
        if np.isfinite(value):
            self.history.append((params, self.sign * value))

    # -- numeric Parzen helpers -------------------------------------------
    @staticmethod
    def _to_unit(s, v):
        if s.get("log"):
            return (math.log(float(v)) - math.log(s["lo"])) / (
                math.log(s["hi"]) - math.log(s["lo"]))
        return (float(v) - s["lo"]) / (s["hi"] - s["lo"])

    @staticmethod
    def _from_unit(s, u):
        u = min(max(u, 0.0), 1.0)
        if s.get("log"):
            return float(np.exp(math.log(s["lo"])
                                + u * (math.log(s["hi"]) - math.log(s["lo"]))))
        return float(s["lo"] + u * (s["hi"] - s["lo"]))

    @staticmethod
    def _parzen_logpdf(x: float, obs: np.ndarray) -> float:
        # Mixture of gaussians at each observation; bandwidth by the
        # 1.06*sigma*n^-1/5 rule with a floor, plus a uniform component.
        n = len(obs)
        bw = max(1.06 * (np.std(obs) + 1e-3) * n ** -0.2, 0.05)
        comp = -0.5 * ((x - obs) / bw) ** 2 - math.log(bw * math.sqrt(2 * math.pi))
        comp = np.concatenate([comp, [0.0]])  # uniform prior on [0,1]
        m = float(np.max(comp))
        return m + math.log(float(np.sum(np.exp(comp - m))) / (n + 1))

    def suggest(self) -> Dict[str, Any]:
        if len(self.history) < self.n_startup:
            return sample(self.space, self.rng)
        hist = sorted(self.history, key=lambda pv: pv[1])
        n_good = max(1, int(math.ceil(self.gamma * len(hist))))
        good, bad = hist[:n_good], hist[n_good:] or hist[-1:]
        out = {}
        for key, s in self.space.items():
            gvals = [p[key] for p, _ in good if key in p]
            bvals = [p[key] for p, _ in bad if key in p]
            if s["kind"] == "interval":
                g = np.asarray([self._to_unit(s, v) for v in gvals])
                b = np.asarray([self._to_unit(s, v) for v in bvals])
                n = len(g)
                bw = max(1.06 * (np.std(g) + 1e-3) * n ** -0.2, 0.05)
                cand = []
                for _ in range(self.n_candidates):
                    if self.rng.rand() < 1.0 / (n + 1):
                        u = self.rng.rand()           # prior component
                    else:
                        u = float(g[self.rng.randint(n)]
                                  + bw * self.rng.randn())
                    u = min(max(u, 0.0), 1.0)
                    cand.append(u)
                scores = [self._parzen_logpdf(u, g) - self._parzen_logpdf(u, b)
                          for u in cand]
                out[key] = self._from_unit(s, cand[int(np.argmax(scores))])
            else:
                values = (s["values"] if s["kind"] == "choice"
                          else list(range(s["lo"], s["hi"] + 1)))
                strv = [str(v) for v in values]
                gc = np.asarray([1.0 + sum(str(v) == sv for v in gvals)
                                 for sv in strv])
                bc = np.asarray([1.0 + sum(str(v) == sv for v in bvals)
                                 for sv in strv])
                w = (gc / gc.sum()) / (bc / bc.sum())
                w = w / w.sum()
                pick = values[int(self.rng.choice(len(values), p=w))]
                out[key] = pick if s["kind"] == "choice" else int(pick)
        return out


def grid(space: Dict[str, dict]) -> List[Dict[str, Any]]:
    import itertools
    axes = []
    for key, s in space.items():
        if s["kind"] == "choice":
            axes.append([(key, v) for v in s["values"]])
        elif s["kind"] == "range":
            axes.append([(key, v) for v in range(s["lo"], s["hi"] + 1)])
        else:
            raise ValueError(f"grid search needs discrete axes; {key} is "
                             f"an interval")
    return [dict(combo) for combo in itertools.product(*axes)]


def run_trial(overrides: List[str], metric: str):
    """One training run in-process; returns the last value of `metric`."""
    from . import train as train_cli
    result = train_cli.main(overrides)
    history = result.get("history", [])
    vals = [row[metric] for row in history if metric in row]
    if metric in ("best_val",) or not vals:
        return float(result.get("best_val", float("nan")))
    return float(vals[-1])


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--n-trials", type=int, default=None,
                help="trial budget (default 20; grid sampler defaults to the\n                full cartesian grid)")
    ap.add_argument("--metric", default="val/loss")
    ap.add_argument("--direction", choices=("minimize", "maximize"),
                    default="minimize")
    ap.add_argument("--sampler", choices=("random", "grid", "tpe"),
                    default="random")
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--param", action="append", default=[],
                    help="search-space spec key=interval(..)|choice(..)|range(..)")
    ap.add_argument("--from-config", default=None,
                    help="load metric/direction/n_trials/sampler/params from "
                         "a hparams_search config (e.g. 'random')")
    ap.add_argument("--out-dir", default="outputs/sweep")
    ap.add_argument("fixed", nargs="*", help="fixed config overrides")
    args = ap.parse_args(argv)

    if args.from_config:
        import yaml
        from ..config.core import DEFAULT_CONFIG_DIR
        sc = yaml.safe_load(
            (DEFAULT_CONFIG_DIR / "hparams_search"
             / f"{args.from_config}.yaml").read_text())
        args.metric = sc.get("metric", args.metric)
        args.direction = sc.get("direction", args.direction)
        if sc.get("n_trials") is not None:
            args.n_trials = int(sc["n_trials"])
        args.sampler = sc.get("sampler", args.sampler)
        args.param = (args.param
                      + [f"{k}={v}" for k, v in (sc.get("params") or {}).items()])

    space = parse_space(args.param)
    rng = np.random.RandomState(args.seed)
    sign = 1.0 if args.direction == "minimize" else -1.0
    tpe = (TPESampler(space, rng, sign) if args.sampler == "tpe" else None)
    if args.sampler == "grid":
        trials = grid(space)
        # A grid search means the FULL cartesian grid unless the user set
        # an explicit budget; silently truncating would report a completed
        # sweep that never evaluated part of the space.
        if args.n_trials is not None and len(trials) > args.n_trials:
            log.warning(f"grid has {len(trials)} points; --n-trials keeps "
                        f"only the first {args.n_trials}")
            trials = trials[: args.n_trials]
    elif args.sampler == "tpe":
        trials = [None] * (args.n_trials or 20)  # suggested adaptively below
    else:
        trials = [sample(space, rng) for _ in range(args.n_trials or 20)]

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    best, best_params = float("inf"), None
    rows = []
    for i, params in enumerate(trials):
        if tpe is not None:
            params = tpe.suggest()
        overrides = args.fixed + [f"{k}={v}" for k, v in params.items()]
        log.info(f"trial {i + 1}/{len(trials)}: {params}")
        try:
            value = run_trial(overrides, args.metric)
        except Exception as e:  # a failed trial must not kill the sweep
            log.warning(f"trial {i + 1} failed: {e}")
            value = float("nan")
        if tpe is not None:
            tpe.tell(params, value)
        rows.append({"trial": i, **params, args.metric: value})
        if np.isfinite(value) and sign * value < best:
            best, best_params = sign * value, params

    with open(out_dir / "trials.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    summary = {"best_value": sign * best if best_params else None,
               "best_params": best_params, "metric": args.metric,
               "direction": args.direction}
    (out_dir / "best.json").write_text(json.dumps(summary, indent=1))
    log.info(f"sweep done: best {args.metric}={summary['best_value']} "
             f"at {best_params}; results in {out_dir}")
    return summary


if __name__ == "__main__":
    main()
