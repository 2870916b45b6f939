"""Native checkpoint save/load + run-directory conventions.

Format: orbax-free msgpack-less simple .npz flat dict (path-joined keys) —
fast, dependency-light, mmap-friendly.  Run layout mirrors the reference
(logs/<experiment>/{ckpt,config,generated,log}/<model_name>, versioned ckpt
dirs, best_k_models.yaml discovery — experiments/experiment.py:107-170,
utils/callbacks.py:10-23) so tooling carries over.  DATAPATH env rewrites
checkpoint roots as in main.py:65-75.
"""
from __future__ import annotations

import json
import os
import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

SEP = "::"


def _flatten(tree, prefix=""):
    out = {}
    if hasattr(tree, "_asdict"):  # namedtuples (e.g. optax states) -> dicts
        tree = dict(tree._asdict())
        if not tree:
            out[f"{prefix}{SEP}__empty__"] = np.asarray(0)
            return out
    if isinstance(tree, dict):
        if not tree:
            out[f"{prefix}{SEP}__empty__"] = np.asarray(0)
            return out
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{SEP}{k}" if prefix else str(k)))
    elif isinstance(tree, (list, tuple)):
        out[f"{prefix}{SEP}__len__"] = np.asarray(len(tree))
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{SEP}{i}"))
    elif tree is None:
        out[f"{prefix}{SEP}__none__"] = np.asarray(0)
    else:
        out[prefix] = np.asarray(tree)
    return out


def _unflatten(flat):
    root = {}
    lens = {k[: -len(SEP + "__len__")]: int(v) for k, v in flat.items() if k.endswith(SEP + "__len__")}
    for key, val in flat.items():
        if key.endswith(SEP + "__len__"):
            continue
        parts = key.split(SEP)
        node = root
        for i, p in enumerate(parts[:-1]):
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)

    def listify(node, prefix=""):
        if not isinstance(node, dict):
            return node
        if "__empty__" in node:
            return {}
        if "__none__" in node:
            return None
        out = {k: listify(v, f"{prefix}{SEP}{k}" if prefix else k) for k, v in node.items()}
        if prefix in lens:
            return [out[str(i)] for i in range(lens[prefix])]
        return out

    return listify(root)


def save(path, tree, metadata: Optional[dict] = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(jax.device_get(tree))
    if metadata:
        flat["__metadata__"] = np.frombuffer(json.dumps(metadata).encode(), np.uint8)
    np.savez(path, **flat)


def load(path):
    data = dict(np.load(path if path.endswith(".npz") else path + ".npz", allow_pickle=False))
    meta = None
    if "__metadata__" in data:
        meta = json.loads(bytes(data.pop("__metadata__")).decode())
    return _unflatten(data), meta


def restore_like(template, loaded):
    """Pour a loaded (dict/list) tree back into the STRUCTURE of ``template``
    — NamedTuples (optax states) come back as real NamedTuples, so a restored
    TrainState feeds straight into the jitted step (resume-from-checkpoint)."""
    if hasattr(template, "_asdict"):
        d = template._asdict()
        return type(template)(**{k: restore_like(v, loaded[k]) for k, v in d.items()})
    if isinstance(template, dict):
        return {k: restore_like(v, loaded[k]) for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        if isinstance(loaded, dict):  # numeric-keyed dict form
            loaded = [loaded[str(i)] for i in range(len(template))]
        return type(template)(restore_like(v, loaded[i]) for i, v in enumerate(template))
    if template is None:
        return None
    return jnp.asarray(loaded)


# ---------------------------------------------------------------------------
# run directories + best-checkpoint discovery (reference layout)
# ---------------------------------------------------------------------------

def datapath_rewrite(path):
    dp = os.environ.get("DATAPATH")
    if dp and not path.startswith(dp):
        return os.path.join(dp, path.lstrip("/"))
    return path


def create_dir_structure(base_dir, experiment, model_name):
    dirs = {
        kind: os.path.join(base_dir, experiment, kind, model_name)
        for kind in ("ckpt", "config", "generated", "log")
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    return dirs


class CheckpointManager:
    """Top-k checkpoint retention monitored on a metric (min), save_last, and
    a best_k_models.json mirror (the reference's best_k_models.yaml protocol
    that eval/GUI use to find the best-FVD ckpt)."""

    def __init__(self, ckpt_dir, monitor="FVD-val", top_k=5):
        self.ckpt_dir = ckpt_dir
        self.monitor = monitor
        self.top_k = top_k
        self.best_k = {}  # path -> value
        os.makedirs(ckpt_dir, exist_ok=True)

    def save_step(self, tree, step, metric_value, metadata=None):
        meta = dict(metadata or {})
        meta.update({"step": int(step), self.monitor: float(metric_value)})
        path = os.path.join(
            self.ckpt_dir, f"step={int(step)}-{self.monitor}={float(metric_value):.3f}.npz"
        )
        save(path, tree, meta)
        self.best_k[path] = float(metric_value)
        if len(self.best_k) > self.top_k:
            worst = max(self.best_k, key=self.best_k.get)
            self.best_k.pop(worst)
            if os.path.exists(worst):
                os.remove(worst)
        save(os.path.join(self.ckpt_dir, "last.npz"), tree, meta)
        with open(os.path.join(self.ckpt_dir, "best_k_models.json"), "w") as f:
            json.dump(self.best_k, f, indent=2)
        # yaml mirror for reference-tooling parity (utils/callbacks.py:10-23)
        try:
            import yaml

            with open(os.path.join(self.ckpt_dir, "best_k_models.yaml"), "w") as f:
                yaml.safe_dump(self.best_k, f)
        except Exception:
            pass
        return path

    @staticmethod
    def find_best(ckpt_dir):
        """best_k_models.json if present, else parse metric values from
        filenames, else last.npz (experiment.py:107-143 discovery order)."""
        bk = os.path.join(ckpt_dir, "best_k_models.json")
        if os.path.exists(bk):
            with open(bk) as f:
                best_k = json.load(f)
            if best_k:
                return min(best_k, key=best_k.get)
        cands = []
        for f in os.listdir(ckpt_dir) if os.path.isdir(ckpt_dir) else []:
            m = re.search(r"=(\d+\.?\d*)\.npz$", f)
            if m and f != "last.npz":
                cands.append((float(m.group(1)), os.path.join(ckpt_dir, f)))
        if cands:
            return min(cands)[1]
        last = os.path.join(ckpt_dir, "last.npz")
        return last if os.path.exists(last) else None
