"""Experiment base: seeding, debug shrinking, run versioning, generic fit loop
(reference: experiments/experiment.py)."""
from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax
import numpy as np

from ipoke_tpu.ckpt.io import CheckpointManager
from ipoke_tpu.utils.logging import RunLogger, get_logger


class Experiment:
    monitor = "loss-val"

    def __init__(self, config, dirs):
        self.config = config
        self.dirs = dirs
        self.console = get_logger(type(self).__name__)
        self.seed = int(config["general"].get("seed", 42))
        np.random.seed(self.seed)
        self.debug = bool(config["general"].get("debug", False))
        if self.debug:
            # shrink everything for a fast end-to-end dry run
            config.setdefault("training", {})
            config["training"]["max_batches_per_epoch"] = 10
            config["training"]["max_val_batches"] = 2
            config["data"]["n_workers"] = 1
        # run versioning: integer version dirs under ckpt.  A fresh TRAINING
        # run gets a new version; resume AND test modes reuse the latest
        # existing version (reference experiment.py:149-170 — previously test
        # mode also bumped, landing in an empty dir and silently evaluating
        # fresh params)
        ckpt_root = dirs["ckpt"]
        existing = [int(d) for d in os.listdir(ckpt_root) if d.isdigit()] if os.path.isdir(ckpt_root) else []
        reuse = config["general"].get("restart") or config["general"].get("test", "none") != "none"
        if not existing:
            version = 0
        elif reuse:
            # newest version that actually holds a checkpoint (empty version
            # dirs can be left behind by crashed/buggy runs)
            with_ckpt = [
                v for v in sorted(existing, reverse=True)
                if CheckpointManager.find_best(os.path.join(ckpt_root, str(v)))
            ]
            version = with_ckpt[0] if with_ckpt else max(existing)
        else:
            version = max(existing) + 1
        self.ckpt_dir = os.path.join(ckpt_root, str(version))
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.ckpt_mgr = CheckpointManager(
            self.ckpt_dir, monitor=self.monitor,
            top_k=int(config.get("logging", {}).get("n_saved_ckpt", 5)),
        )
        self.logger = RunLogger(dirs["log"])

    # ------------------------------------------------------------------
    def fit(
        self,
        train_step: Callable,
        state,
        datamodule,
        rng,
        n_epochs: int,
        validate: Optional[Callable] = None,
        val_every_steps: Optional[int] = None,
        max_batches_per_epoch: Optional[int] = None,
        device_put=None,
        log_every: int = 50,
    ):
        """Generic training loop: host loader -> (optional shard) -> jitted
        step; periodic validation returning {monitor: value} drives top-k
        checkpointing."""
        step_i = int(state.step) if hasattr(state, "step") else 0
        jit_step = jax.jit(train_step) if not getattr(train_step, "_jitted", False) else train_step

        # preemption handling (SURVEY §5: checkpoint-on-signal for
        # preemptible TPUs — absent in the reference): SIGTERM/SIGINT saves
        # last.npz before exiting.
        import signal

        preempted = {"flag": False}

        def _on_signal(signum, frame):
            preempted["flag"] = True

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:
                pass  # non-main thread

        for epoch in range(n_epochs):
            t0 = time.time()
            for bi, batch in enumerate(datamodule.loader("train")):
                if max_batches_per_epoch and bi >= max_batches_per_epoch:
                    break
                if device_put is not None:
                    batch = device_put(batch)
                rng, sub = jax.random.split(rng)
                state, metrics = jit_step(state, batch, sub)
                step_i += 1
                if step_i % log_every == 0:
                    metrics = {k: float(np.asarray(v)) for k, v in metrics.items()}
                    self.logger.log_scalars(step_i, metrics, prefix="train/")
                    self.console.info(
                        f"epoch {epoch} step {step_i}: "
                        + " ".join(f"{k}={v:.4f}" for k, v in list(metrics.items())[:4])
                    )
                if validate and val_every_steps and step_i % val_every_steps == 0:
                    state = self._run_validation(validate, state, datamodule, step_i)
                if preempted["flag"]:
                    self.console.warning("preemption signal: saving last checkpoint")
                    from ipoke_tpu.ckpt.io import save

                    save(os.path.join(self.ckpt_dir, "last.npz"), self._ckpt_tree(state),
                         metadata={"step": step_i, "preempted": True})
                    for sig, h in old_handlers.items():
                        signal.signal(sig, h)
                    return state
            self.console.info(f"epoch {epoch} done in {time.time()-t0:.1f}s")
            if validate:
                state = self._run_validation(validate, state, datamodule, step_i)
        for sig, h in old_handlers.items():
            signal.signal(sig, h)
        return state

    def _run_validation(self, validate, state, datamodule, step_i):
        val_metrics = validate(state, datamodule)
        val_metrics = {k: float(np.asarray(v)) for k, v in val_metrics.items()}
        self.logger.log_scalars(step_i, val_metrics, prefix="")
        if self.monitor in val_metrics:
            self.ckpt_mgr.save_step(
                self._ckpt_tree(state), step_i, val_metrics[self.monitor]
            )
        return state

    def _ckpt_tree(self, state):
        return state._asdict() if hasattr(state, "_asdict") else state

    def maybe_resume(self, state):
        """--resume: restore the full TrainState (params + optimizer moments +
        step) from the run's last.npz (reference resume_from_checkpoint,
        main.py:25-60).  Fresh state when nothing to resume."""
        if not self.config["general"].get("restart"):
            return state
        path = os.path.join(self.ckpt_dir, "last.npz")
        if not os.path.exists(path):
            self.console.warning("--resume but no last.npz here; training fresh")
            return state
        from ipoke_tpu.ckpt.io import load, restore_like

        tree, meta = load(path)
        try:
            restored = restore_like(state, tree)
        except (KeyError, TypeError) as e:
            self.console.warning(f"resume failed ({e}); training fresh")
            return state
        self.console.info(f"resumed TrainState from {path} (meta {meta})")
        return restored
