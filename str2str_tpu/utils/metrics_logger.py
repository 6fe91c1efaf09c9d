"""Pluggable experiment loggers (reference configs/logger/*.yaml surface).

The reference instantiates Lightning loggers from the `logger` config group
(csv / tensorboard / wandb / many_loggers). Equivalents here:

  * CSVLogger        — append-to-csv rows (the round-1 default, unchanged)
  * TensorBoardLogger— torch.utils.tensorboard SummaryWriter (ships w/ torch)
  * WandbLogger      — weights & biases; degrades to a warning when the
                       package is absent from the image
  * MultiLogger      — fan-out to several

`build_loggers(cfg)` maps the config group to instances; every logger
implements `log_metrics(row: dict, step: int)`, `log_hyperparams(params)`
and `finalize()`.
"""
from __future__ import annotations

import csv
from pathlib import Path
from typing import Any, Dict, List, Optional

from .logging import get_logger

log = get_logger(__name__)


class CSVLogger:
    def __init__(self, save_dir: str, filename: str = "metrics.csv"):
        self.path = Path(save_dir) / filename
        self._fields: Optional[List[str]] = None

    def log_metrics(self, row: Dict[str, Any], step: Optional[int] = None):
        """Append a row, keeping ONE consistent header: rows may carry
        different key sets (train metrics every N steps, val metrics every
        M epochs), so when new columns appear the file is rewritten with
        the union header (cheap: epoch-cadence logging)."""
        self.path.parent.mkdir(parents=True, exist_ok=True)
        if self._fields is None and self.path.exists():
            with open(self.path, newline="") as f:
                r = csv.reader(f)
                self._fields = next(r, None) or None
        fields = self._fields or []
        new = [k for k in row.keys() if k not in fields]
        if new:
            fields = fields + new
            if self.path.exists() and self._fields:
                with open(self.path, newline="") as f:
                    old_rows = list(csv.DictReader(f))
                with open(self.path, "w", newline="") as f:
                    w = csv.DictWriter(f, fieldnames=fields, restval="")
                    w.writeheader()
                    w.writerows(old_rows)
            else:
                with open(self.path, "w", newline="") as f:
                    csv.DictWriter(f, fieldnames=fields).writeheader()
            self._fields = fields
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields, restval="",
                               extrasaction="ignore")
            w.writerow(row)

    def log_hyperparams(self, params: Dict[str, Any]):
        p = self.path.parent / "hparams.csv"
        p.parent.mkdir(parents=True, exist_ok=True)
        with open(p, "w", newline="") as f:
            w = csv.writer(f)
            for k, v in sorted(params.items()):
                w.writerow([k, v])

    def finalize(self):
        pass


class TensorBoardLogger:
    def __init__(self, save_dir: str):
        from torch.utils.tensorboard import SummaryWriter
        Path(save_dir).mkdir(parents=True, exist_ok=True)
        self.writer = SummaryWriter(log_dir=save_dir)

    def log_metrics(self, row: Dict[str, Any], step: Optional[int] = None):
        step = int(row.get("step", step or 0))
        for k, v in row.items():
            if isinstance(v, (int, float)) and k != "step":
                self.writer.add_scalar(k, v, global_step=step)

    def log_hyperparams(self, params: Dict[str, Any]):
        self.writer.add_text(
            "hparams", "\n".join(f"{k}: {v}" for k, v in sorted(params.items())))

    def finalize(self):
        self.writer.flush()
        self.writer.close()


class WandbLogger:
    def __init__(self, project: str = "str2str_tpu", save_dir: str = ".",
                 name: Optional[str] = None, tags=()):
        try:
            import wandb
        except ImportError:
            log.warning("wandb is not installed; WandbLogger is a no-op")
            self.run = None
            return
        self.run = wandb.init(project=project, dir=save_dir, name=name,
                              tags=list(tags), reinit=True)

    def log_metrics(self, row: Dict[str, Any], step: Optional[int] = None):
        if self.run is not None:
            self.run.log({k: v for k, v in row.items()
                          if isinstance(v, (int, float))},
                         step=int(row.get("step", step or 0)))

    def log_hyperparams(self, params: Dict[str, Any]):
        if self.run is not None:
            self.run.config.update(params, allow_val_change=True)

    def finalize(self):
        if self.run is not None:
            self.run.finish()


class _SoftBackendLogger:
    """Base for optional-dependency backends (reference
    configs/logger/{mlflow,neptune,comet,aim}.yaml): tries the import in
    __init__; when the package is absent the logger degrades to a warning
    no-op, exactly like WandbLogger."""

    backend = ""

    def __init__(self, **kw):
        self._ok = False
        try:
            self._setup(**kw)
            self._ok = True
        except ImportError:
            log.warning(f"{self.backend} is not installed; "
                        f"{type(self).__name__} is a no-op")
        except Exception as e:  # mis-config (missing token/uri) degrades too
            log.warning(f"{type(self).__name__} disabled: {e}")

    def _setup(self, **kw):
        raise NotImplementedError

    def log_metrics(self, row: Dict[str, Any], step: Optional[int] = None):
        if self._ok:
            self._log(row, int(row.get("step", step or 0)))

    def _log(self, row, step):
        raise NotImplementedError

    def log_hyperparams(self, params: Dict[str, Any]):
        pass

    def finalize(self):
        pass


class MLFlowLogger(_SoftBackendLogger):
    backend = "mlflow"

    def _setup(self, tracking_uri: str = "outputs/logs/mlflow/mlruns",
               experiment_name: str = "str2str_tpu", **_):
        import mlflow
        self._mlflow = mlflow
        mlflow.set_tracking_uri(str(tracking_uri))
        mlflow.set_experiment(experiment_name)
        self._run = mlflow.start_run()

    def _log(self, row, step):
        self._mlflow.log_metrics(
            {k.replace("/", "_"): float(v) for k, v in row.items()
             if isinstance(v, (int, float))}, step=step)

    def log_hyperparams(self, params):
        if self._ok:
            self._mlflow.log_params({k.replace("/", "_"): v
                                     for k, v in params.items()})

    def finalize(self):
        if self._ok:
            self._mlflow.end_run()


class NeptuneLogger(_SoftBackendLogger):
    backend = "neptune"

    def _setup(self, project: str = "", **_):
        import neptune
        self._run = neptune.init_run(project=project or None)

    def _log(self, row, step):
        for k, v in row.items():
            if isinstance(v, (int, float)):
                self._run[k].append(v, step=step)

    def log_hyperparams(self, params):
        if self._ok:
            self._run["hparams"] = params

    def finalize(self):
        if self._ok:
            self._run.stop()


class CometLogger(_SoftBackendLogger):
    backend = "comet_ml"

    def _setup(self, project_name: str = "str2str_tpu", **_):
        import comet_ml
        self._exp = comet_ml.Experiment(project_name=project_name)

    def _log(self, row, step):
        self._exp.log_metrics(
            {k: v for k, v in row.items() if isinstance(v, (int, float))},
            step=step)

    def log_hyperparams(self, params):
        if self._ok:
            self._exp.log_parameters(params)

    def finalize(self):
        if self._ok:
            self._exp.end()


class AimLogger(_SoftBackendLogger):
    backend = "aim"

    def _setup(self, repo: Optional[str] = None,
               experiment: Optional[str] = None, **_):
        import aim
        self._run = aim.Run(repo=repo, experiment=experiment)

    def _log(self, row, step):
        for k, v in row.items():
            if isinstance(v, (int, float)):
                self._run.track(v, name=k, step=step)

    def log_hyperparams(self, params):
        if self._ok:
            self._run["hparams"] = dict(params)

    def finalize(self):
        if self._ok:
            self._run.close()


class MultiLogger:
    def __init__(self, loggers):
        self.loggers = list(loggers)

    def log_metrics(self, row, step=None):
        for lg in self.loggers:
            lg.log_metrics(row, step)

    def log_hyperparams(self, params):
        for lg in self.loggers:
            lg.log_hyperparams(params)

    def finalize(self):
        for lg in self.loggers:
            lg.finalize()


def build_logger(name: str, save_dir: str, **kw):
    name = (name or "csv").lower()
    if name == "csv":
        return CSVLogger(save_dir)
    if name == "tensorboard":
        return TensorBoardLogger(str(Path(save_dir) / "tensorboard"))
    if name == "wandb":
        return WandbLogger(save_dir=save_dir, **kw)
    if name == "mlflow":
        return MLFlowLogger(**kw)
    if name == "neptune":
        return NeptuneLogger(**kw)
    if name == "comet":
        return CometLogger(**kw)
    if name == "aim":
        return AimLogger(**kw)
    if name in ("many", "many_loggers"):
        return MultiLogger([CSVLogger(save_dir),
                            TensorBoardLogger(str(Path(save_dir) / "tensorboard"))])
    raise ValueError(f"unknown logger {name!r}")


def build_loggers(cfg) -> MultiLogger:
    """From the config `logger` group (name + optional kwargs).
    `logger: null` (debug profiles, reference configs/debug/default.yaml)
    disables experiment logging entirely."""
    if "logger" in cfg and not cfg.get("logger"):
        return MultiLogger([])
    lg = cfg.get("logger") or {}
    name = lg.get("name", "csv") if hasattr(lg, "get") else str(lg)
    save_dir = str(lg.get("save_dir", "outputs/logs")) if hasattr(lg, "get") \
        else "outputs/logs"
    extra = {k: v for k, v in (dict(lg) if hasattr(lg, "items") else {}).items()
             if k not in ("name", "save_dir")}
    built = build_logger(name, save_dir, **extra)
    return built if isinstance(built, MultiLogger) else MultiLogger([built])
