"""Minimal Hydra-style YAML config system.

The reference's public API surface is its Hydra config tree (SURVEY.md §5.6);
this module keeps that surface without the Hydra dependency (not available in
this environment):

  * composition: a top-level ``defaults`` list of ``group: name`` entries
    pulls ``<config_dir>/<group>/<name>.yaml`` into ``cfg.<group>``;
  * CLI overrides: ``a.b.c=value`` (dotted set), ``group=name`` (swap a
    defaults-group file), ``+a.b=value`` (add new key);
  * interpolation: ``${a.b}`` references and ``${env:VAR,default}``;
  * attribute access (``cfg.model.diffuser.min_t``) over plain dicts.

Example:
    cfg = load_config("eval", ["data=sampling", "inference.n_replica=10"])
"""
from __future__ import annotations

import copy
import os
import re
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml

DEFAULT_CONFIG_DIR = Path(__file__).parent / "configs"


class Config(dict):
    """dict with attribute access and dotted get/set."""

    def __getattr__(self, name: str) -> Any:
        try:
            v = self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        return Config(v) if isinstance(v, dict) and not isinstance(v, Config) else v

    def __setattr__(self, name: str, value: Any):
        self[name] = value

    def get_path(self, path: str, default=None):
        node: Any = self
        for part in path.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def set_path(self, path: str, value: Any, allow_new: bool = True):
        parts = path.split(".")
        node: Dict = self
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], dict):
                if not allow_new and part not in node:
                    raise KeyError(f"unknown config path: {path}")
                node[part] = {}
            node = node[part]
        if not allow_new and parts[-1] not in node:
            raise KeyError(f"unknown config key: {path} "
                           f"(use +{path}=... to add new keys)")
        node[parts[-1]] = value

    def to_dict(self) -> dict:
        def conv(x):
            if isinstance(x, dict):
                return {k: conv(v) for k, v in x.items()}
            if isinstance(x, list):
                return [conv(v) for v in x]
            return x
        return conv(self)


_NUMERIC = re.compile(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def _parse_value(text: str) -> Any:
    """YAML-parse a scalar override value ('5'->int, 'true'->bool, ...).

    YAML 1.1 does not treat '3e-4' (no decimal point) as a float; catch that
    class of scientific-notation literals explicitly so numeric CLI overrides
    never silently become strings."""
    try:
        v = yaml.safe_load(text)
    except yaml.YAMLError:
        return text
    if isinstance(v, str) and _NUMERIC.match(v.strip()):
        try:
            return float(v)
        except ValueError:
            return v
    return v


def _deep_merge(base: dict, extra: dict) -> dict:
    out = dict(base)
    for k, v in extra.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


_INTERP = re.compile(r"\$\{([^}]+)\}")

_RUN_TS: Dict[str, str] = {}


def _run_timestamp(fmt: str) -> str:
    """Timestamp frozen at first use per format (one run dir per process)."""
    if fmt not in _RUN_TS:
        import datetime
        _RUN_TS[fmt] = datetime.datetime.now().strftime(fmt)
    return _RUN_TS[fmt]


def _interpolate(node: Any, root: Config) -> Any:
    if isinstance(node, dict):
        return {k: _interpolate(v, root) for k, v in node.items()}
    if isinstance(node, list):
        return [_interpolate(v, root) for v in node]
    if not isinstance(node, str):
        return node

    def resolve(expr: str) -> Any:
        expr = expr.strip()
        if expr.startswith("env:") or expr.startswith("oc.env:"):
            body = expr.split(":", 1)[1]
            var, _, default = body.partition(",")
            return os.environ.get(var.strip(), default.strip() or None)
        if expr.startswith("now:"):
            # Hydra-style run timestamp (reference configs/hydra/default.yaml
            # run-dir pattern); one value per process so every path sharing
            # the interpolation lands in the same run directory.
            return _run_timestamp(expr.split(":", 1)[1] or "%Y-%m-%d_%H-%M-%S")
        val = root.get_path(expr)
        if isinstance(val, str) and _INTERP.search(val):
            val = _interpolate(val, root)
        return val

    m = _INTERP.fullmatch(node)
    if m:  # whole-string interpolation keeps the referenced type
        return resolve(m.group(1))
    return _INTERP.sub(lambda mm: str(resolve(mm.group(1))), node)


def load_config(config_name: str, overrides: Optional[List[str]] = None,
                config_dir: Optional[str | Path] = None) -> Config:
    config_dir = Path(config_dir or DEFAULT_CONFIG_DIR)
    overrides = list(overrides or [])

    def read_yaml(rel: str) -> dict:
        path = config_dir / f"{rel}.yaml"
        if not path.exists():
            raise FileNotFoundError(f"config file not found: {path}")
        out = yaml.safe_load(path.read_text()) or {}
        # Group-file inheritance (Hydra's in-group `defaults` list of plain
        # sibling names, e.g. reference configs/debug/fdr.yaml:
        # `defaults: [default]` pulls debug/default.yaml underneath). The
        # ROOT config's defaults list ({group: name} entries) is handled by
        # load_config, not here.
        sub_defaults = out.get("defaults")
        if (sub_defaults and "/" in rel
                and all(isinstance(e, str) for e in sub_defaults)):
            out = dict(out)
            out.pop("defaults")
            group = rel.rsplit("/", 1)[0]
            merged: dict = {}
            for entry in sub_defaults:
                if entry == "_self_":
                    merged = _deep_merge(merged, out)
                    out = {}
                    continue
                merged = _deep_merge(merged, read_yaml(f"{group}/{entry}"))
            out = _deep_merge(merged, out)
        return out

    root = read_yaml(config_name)
    defaults = root.pop("defaults", [])

    # Group-swap overrides (e.g. `data=sampling`) apply to the defaults list.
    group_overrides: Dict[str, Optional[str]] = {}
    dotted: List[tuple] = []
    for ov in overrides:
        if ov.startswith("+"):
            key, _, val = ov[1:].partition("=")
            dotted.append((key, _parse_value(val), True))
        else:
            key, _, val = ov.partition("=")
            if "." not in key and (config_dir / key / f"{_parse_value(val)}.yaml").exists():
                group_overrides[key] = str(_parse_value(val))
            else:
                dotted.append((key, _parse_value(val), False))

    cfg: dict = {}
    for entry in defaults:
        if entry == "_self_":
            cfg = _deep_merge(cfg, root)
            continue
        if isinstance(entry, str):
            cfg = _deep_merge(cfg, read_yaml(entry))
            continue
        (group, name), = entry.items()
        optional = False
        if isinstance(group, str) and group.startswith("optional "):
            group, optional = group.split(" ", 1)[1], True
        name = group_overrides.pop(group, name)
        if name is None:
            continue
        try:
            sub = read_yaml(f"{group}/{name}")
        except FileNotFoundError:
            if optional:
                continue
            raise
        # Hydra's `@package _global_` equivalent: a `_global_: true` marker
        # makes the file merge at the config ROOT (experiment/debug files
        # override keys across groups, reference configs/experiment/*).
        if sub.pop("_global_", False):
            cfg = _deep_merge(cfg, sub)
        else:
            cfg = _deep_merge(cfg, {group: sub})
    if "_self_" not in defaults:
        cfg = _deep_merge(cfg, root)
    for group, name in group_overrides.items():
        if name is not None:
            sub = read_yaml(f"{group}/{name}")
            if sub.pop("_global_", False):
                cfg = _deep_merge(cfg, sub)
            else:
                cfg = _deep_merge(cfg, {group: sub})

    config = Config(copy.deepcopy(cfg))
    for key, value, allow_new in dotted:
        config.set_path(key, value, allow_new=allow_new or True)
    return Config(_interpolate(config, config))


def parse_cli(argv: List[str]) -> tuple[str | None, List[str]]:
    """Split argv into (config_name override via --config-name, overrides)."""
    name = None
    overrides = []
    it = iter(argv)
    for a in it:
        if a in ("--config-name", "-cn"):
            name = next(it)
        elif a.startswith("--config-name="):
            name = a.split("=", 1)[1]
        else:
            overrides.append(a)
    return name, overrides


def format_config_tree(cfg: Config, indent: int = 0) -> str:
    """Plain-text config tree dump (reference rich_utils.print_config_tree,
    rich_utils.py:18-75 — written to config_tree.log by the entry points)."""
    lines = []
    pad = "  " * indent
    for key in sorted(cfg.keys()):
        val = cfg[key]
        if isinstance(val, dict):
            lines.append(f"{pad}{key}:")
            lines.append(format_config_tree(Config(val), indent + 1))
        else:
            lines.append(f"{pad}{key}: {val!r}")
    return "\n".join(l for l in lines if l)


def dump_config_tree(cfg: Config, out_dir: str) -> None:
    from pathlib import Path as _P
    d = _P(out_dir)
    try:
        d.mkdir(parents=True, exist_ok=True)
        (d / "config_tree.log").write_text(format_config_tree(cfg) + "\n")
    except OSError:
        pass
