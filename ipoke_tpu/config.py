"""Config system: YAML surface mirroring the reference (nested sections
general/data/architecture/training/logging/testing/d_t/d_s/ui), with per-run
persistence and resume-prefers-saved-config semantics (main.py:18-63)."""
from __future__ import annotations

import os
from typing import Optional

import yaml


def _tuple_constructor(loader, node):
    return tuple(loader.construct_sequence(node))


yaml.SafeLoader.add_constructor("tag:yaml.org,2002:python/tuple", _tuple_constructor)


def load_yaml(path):
    with open(path) as f:
        return yaml.safe_load(f)


def save_yaml(cfg, path):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)


def load_parameters(config_path, model_name, base_dir=None, restart=False, test_mode="none"):
    """Reference semantics (main.py:18-63): on resume/test, the run's SAVED
    config wins over the CLI config — except the ``testing:`` section which is
    always taken fresh from the CLI config.

    base_dir resolution: explicit argument > config ``general.base_dir`` >
    "logs" (previously the config value was silently ignored and artifacts
    always landed under ./logs)."""
    cli_cfg = load_yaml(config_path)
    if base_dir is None:
        base_dir = cli_cfg.get("general", {}).get("base_dir", "logs")
    experiment = cli_cfg["general"]["experiment"]
    dirs = {
        kind: os.path.join(base_dir, experiment, kind, model_name)
        for kind in ("ckpt", "config", "generated", "log")
    }
    saved = os.path.join(dirs["config"], "config.yaml")
    if (not restart and test_mode == "none" and os.path.exists(saved)
            and not cli_cfg.get("general", {}).get("debug")):
        # reference main.py:39-53: training a name that already exists asks
        # whether to resume (y -> saved config wins) or overwrite (n).  Only
        # interactive sessions prompt; scripted runs keep the explicit
        # --resume contract and start fresh as before.
        import sys

        if sys.stdin is not None and sys.stdin.isatty():
            print("WARNING: Model has been started somewhen earlier: "
                  "Resume training (y/n)?")
            while True:
                answer = input().strip().lower()
                if answer in ("y", "yes"):
                    restart = True
                    break
                if answer in ("n", "no"):
                    break
                print("Invalid answer! Try again!(y/n)")
    if (restart or test_mode != "none") and os.path.exists(saved):
        cfg = load_yaml(saved)
        cfg["testing"] = cli_cfg.get("testing", cfg.get("testing", {}))
    else:
        cfg = cli_cfg
        for d in dirs.values():
            os.makedirs(d, exist_ok=True)
        save_yaml(cfg, saved)
    cfg.setdefault("general", {})
    cfg["general"]["model_name"] = model_name
    cfg["general"]["base_dir"] = base_dir
    cfg["general"]["restart"] = restart
    cfg["general"]["test"] = test_mode
    return cfg, dirs
