"""Distillation experiment: compress a trained second-stage teacher's
sampling path (config ``general.experiment: distill``).

Usage — same CLI as every experiment (the model name addresses the TEACHER's
run tree; the student trains into a fresh version dir under it):

    python main.py -c configs/distill.yaml -m my_model            # train
    python main.py -c configs/distill.yaml -m my_model --test samples

The teacher's best checkpoint is discovered with the same
best_k protocol test modes use; conditioning batches come from the regular
datamodule (real x0/poke pairs), targets are teacher reverse passes.  See
train/distill.py for the student families and the TPU rationale (the
sequential MCF inverse is the sampling bottleneck; a distilled student
removes it).  Beyond-reference subsystem: the reference always samples
through the full cINN inverse.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ipoke_tpu.ckpt import io as ckpt_io
from ipoke_tpu.experiments.base import Experiment
from ipoke_tpu.experiments.second_stage import build_spec_from_config
from ipoke_tpu.flows import transformer
from ipoke_tpu.models import second_stage as model_ss
from ipoke_tpu.train import distill
from ipoke_tpu.train import second_stage as train_ss


class DistillExperiment(Experiment):
    monitor = "distill-val"
    datakeys = ("images", "poke")

    def __init__(self, config, dirs):
        super().__init__(config, dirs)
        self.spec = build_spec_from_config(config)
        dcfg = config.get("distill", {})
        kind = dcfg.get("student", "direct")
        if kind == "direct":
            self.student = distill.DirectStudentSpec(
                hidden=int(dcfg.get("hidden", 256)),
                depth=int(dcfg.get("depth", 6)),
            )
        elif kind == "flow":
            num_steps = dcfg.get("num_steps") or [1] * len(self.spec.flow.num_steps)
            self.student = distill.flow_student_spec(
                self.spec.flow, tuple(int(n) for n in num_steps)
            )
        else:
            raise ValueError(f"distill.student must be direct|flow, got {kind}")
        self.dcfg = dcfg
        from ipoke_tpu.data.datamodule import StaticDataModule

        self.datamod = StaticDataModule(config["data"], datakeys=self.datakeys)

    # ------------------------------------------------------------------

    def _teacher_root(self):
        """``distill.teacher_ckpt`` (explicit dir or file) wins; default is
        the same model name's second_stage run tree (dirs are
        base/<experiment>/<kind>/<model>, so swap the experiment segment)."""
        explicit = self.dcfg.get("teacher_ckpt")
        if explicit:
            return explicit
        sep = os.sep
        return self.dirs["ckpt"].replace(
            f"{sep}distill{sep}", f"{sep}second_stage{sep}"
        )

    def _load_teacher(self):
        """Teacher = best checkpoint in the newest version dir that has one."""
        ckpt_root = self._teacher_root()
        if os.path.isfile(ckpt_root):
            best = ckpt_root
        else:
            versions = sorted(
                (int(d) for d in os.listdir(ckpt_root) if d.isdigit()), reverse=True
            ) if os.path.isdir(ckpt_root) else []
            best = None
            for v in versions:
                best = ckpt_io.CheckpointManager.find_best(
                    os.path.join(ckpt_root, str(v))
                )
                if best:
                    break
        rng = jax.random.PRNGKey(self.seed)
        params = jax.jit(lambda k: model_ss.init(k, self.spec))(rng)
        if best:
            tree, _ = ckpt_io.load(best)
            saved = tree.get("params", tree)
            loaded = {k: v for k, v in saved.items() if k in train_ss.TRAINABLE_KEYS}
            if not loaded:
                loaded = {k: v for k, v in saved.items() if k in params}
            params.update(loaded)
            self.console.info(f"teacher checkpoint: {best} ({sorted(loaded)})")
        else:
            self.console.warning(
                "no teacher checkpoint found; distilling a FRESH teacher "
                "(smoke/debug only — the student will imitate random weights)"
            )
        return params

    def _z_shape(self, b):
        flow_spec = self.spec.flow if isinstance(self.student, distill.DirectStudentSpec) \
            else self.student
        return transformer.reverse_input_shape(
            flow_spec, b, self.spec.latent_size, self.spec.flow_in_channels
        )

    # ------------------------------------------------------------------

    def train(self):
        cfg_t = self.config.get("training", {})
        teacher = self._load_teacher()
        opt = optax.adam(float(self.dcfg.get("lr", 1e-4)))
        init_state, dstep = distill.make_distill_step(self.spec, self.student, opt)
        state = self.maybe_resume(init_state(jax.random.PRNGKey(self.seed)))

        jstep = jax.jit(dstep)
        jcond = jax.jit(
            lambda p, x0, pk: model_ss.embed_cond(p, self.spec, x0, pk)
        )

        def step(state, batch, rng):
            # Python wrapper calling inner jitted fns: the teacher rides as
            # an ARGUMENT (a closed-over teacher would be baked into the
            # jitted graph as constants — 4.2 GB at flagship size)
            x0 = batch["images"][:, 0]
            poke = batch["poke"]
            cond = jcond(teacher, x0, poke)
            z = jax.random.normal(rng, self._z_shape(x0.shape[0]))
            return jstep(state, teacher, z, cond)

        step._jitted = True  # fit() must not wrap the Python driver in jit
        self._teacher = teacher
        self._jcond = jcond
        steps_per_epoch = int(cfg_t.get("max_batches_per_epoch", 500))
        state = self.fit(
            step, state, self.datamod, jax.random.PRNGKey(self.seed + 1),
            n_epochs=int(cfg_t.get("n_epochs", 10)),
            validate=self.validate,
            val_every_steps=int(steps_per_epoch * float(cfg_t.get("val_every", 1.0))),
            max_batches_per_epoch=steps_per_epoch,
        )
        return state

    def validate(self, state, datamod):
        """Held-out distillation loss (MSE for direct / NLL for flow)."""
        teacher = self._teacher
        is_direct = isinstance(self.student, distill.DirectStudentSpec)

        def val_loss(sp, teacher, z, cond):
            if is_direct:
                return distill.direct_loss(sp, self.student, teacher, self.spec, z, cond)[0]
            return distill.flow_student_loss(sp, self.student, teacher, self.spec, z, cond)[0]

        jval = jax.jit(val_loss)
        losses = []
        max_b = int(self.config.get("training", {}).get("max_val_batches", 4))
        for bi, batch in enumerate(datamod.loader("val")):
            if bi >= max_b:
                break
            x0 = batch["images"][:, 0]
            cond = self._jcond(teacher, x0, batch["poke"])
            z = jax.random.normal(jax.random.PRNGKey(9000 + bi), self._z_shape(x0.shape[0]))
            losses.append(float(jval(state["params"], teacher, z, cond)))
        return {"distill-val": float(np.mean(losses)) if losses else float("nan")}

    # ------------------------------------------------------------------

    def test(self, mode: Optional[str] = None):
        """samples: side-by-side teacher vs student videos on test pokes."""
        teacher = self._load_teacher()
        best = ckpt_io.CheckpointManager.find_best(self.ckpt_dir)
        if not best:
            raise FileNotFoundError(
                f"no student checkpoint under {self.ckpt_dir}; train first"
            )
        tree, meta = ckpt_io.load(best)
        student_params = tree.get("params", tree)
        self.console.info(f"student checkpoint: {best}")

        out_dir = os.path.join(self.dirs["generated"], "distill_samples")
        os.makedirs(out_dir, exist_ok=True)
        from ipoke_tpu.utils import video as vutil

        self.datamod.setup()
        n = int(self.config.get("testing", {}).get("n_examples", 2))
        jsample_t = jax.jit(
            lambda p, b, k: model_ss.forward_sample(
                p, self.spec, b, k, add_first_frame=True)
        )
        written = []
        for bi, batch in enumerate(self.datamod.loader("test")):
            if bi >= n:
                break
            key = jax.random.PRNGKey(1000 + bi)
            vid_t = np.asarray(jsample_t(teacher, batch, key)[0])
            vid_s = np.asarray(distill.forward_sample_student(
                teacher, student_params, self.student, self.spec, batch, key,
                add_first_frame=True)[0])
            for name, vid in (("teacher", vid_t), ("student", vid_s)):
                path = os.path.join(out_dir, f"ex{bi}_{name}.mp4")
                vutil.save_video(vid[0], path)
                written.append(path)
        return {"n_examples": n, "dir": out_dir, "files": written}
