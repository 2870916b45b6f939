"""AOT serving artifacts: compile-once, ship-the-binary deployment.

A serving artifact is a directory that contains everything needed to run the
flagship sampling path WITHOUT any ipoke_tpu model code at load time:

    manifest.json      shapes, buckets, unroll length, format version
    params.npz         the parameter tree (ckpt/io flat-npz format)
    sampler_b<B>.bin   jax.export-serialized StableHLO of the full sample
                       step (flow reverse + decode) at batch bucket B

This is the standard production shape for TPU inference: the model is traced
and lowered ONCE at export time (on a dev machine), the serving fleet only
deserializes + compiles the frozen StableHLO — no Python model definitions,
no version skew between training code and serving code, and the artifact is
auditable/diffable.  ``jax.export`` guarantees forward compatibility of the
serialized module across jax releases.

The batch-bucket ladder mirrors serve/batcher.py: static shapes only, one
exported module per bucket (XLA compiles one executable per shape anyway —
the ladder just makes that explicit and shippable).

Reference parity note: the reference (CompVis/ipoke) has no deployment story
— testing/gui.py drives the live torch module.  This subsystem is
beyond-reference, but the exported function IS the reference's sampling
semantics (second_stage.forward_sample, cf. second_stage_video.py forward
sampling path).

CLI:
    python -m ipoke_tpu.serve.artifact export --synth-model iper_128 \
        --out /tmp/art [--buckets 1,2,4,8] [--platforms tpu,cpu]
    python -m ipoke_tpu.serve.artifact verify --dir /tmp/art
"""
from __future__ import annotations

import json
import pathlib
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from ipoke_tpu.ckpt import io as ckpt_io
from ipoke_tpu.flows import transformer
from ipoke_tpu.models import second_stage

FORMAT_VERSION = 1


def _canonicalize(tree):
    """dict/list/tuple containers -> dict/list (the ckpt/io npz round-trip
    produces exactly these), leaves -> jnp arrays.  Export and params.npz
    must share ONE treedef or Exported.call rejects the loaded tree.
    NamedTuples become dicts — ckpt_io._flatten serializes them via
    ``_asdict``, so the loaded tree is a dict; canonicalizing them to lists
    instead would desync the two treedefs."""
    if hasattr(tree, "_asdict"):  # namedtuples (mirror ckpt/io._flatten)
        return {k: _canonicalize(v) for k, v in tree._asdict().items()}
    if isinstance(tree, dict):
        return {k: _canonicalize(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_canonicalize(v) for v in tree]
    if tree is None:
        return None
    return jnp.asarray(tree)


def _sample_fn(spec, length):
    def _run(params, x0, poke, z):
        batch = {"images": x0[:, None], "poke": poke}
        return second_stage.forward_sample(
            params, spec, batch, None, length=length, add_first_frame=True, z=z
        )[0]

    return _run


def _sample_fn_student(spec, ds, length):
    """Student-sampler variant: the distilled direct student replaces the
    sequential flow reverse (train/distill.py) — same (params, x0, poke, z)
    signature, with the student params nested under params['student'] and the
    teacher's embed/decode tree under params['base']."""
    from ipoke_tpu.train import distill

    def _run(params, x0, poke, z):
        batch = {"images": x0[:, None], "poke": poke}
        return distill.forward_sample_student(
            params["base"], params["student"], ds, spec, batch, None,
            length=length, add_first_frame=True, z=z,
        )[0]

    return _run


def z_shape_of(spec):
    """Per-example Gaussian input shape of the flow reverse pass."""
    return tuple(
        transformer.reverse_input_shape(
            spec.flow, 1, spec.latent_size, spec.flow_in_channels
        )[1:]
    )


def export_sampler(
    params,
    spec,
    out_dir,
    buckets: Sequence[int] = (1, 2, 4, 8),
    length: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
    student=None,
    wire_u8: bool = False,
):
    """Trace + lower the sample step at every batch bucket and write the
    artifact directory.  ``platforms`` defaults to the current backend; pass
    e.g. ``("tpu", "cpu")`` for a multi-platform artifact.

    ``student=(student_params, DirectStudentSpec)`` exports the distilled
    direct sampler instead of the sequential flow reverse (the ~14x-cheaper
    reverse stage, NOTES.md r4); the z input signature is unchanged.

    ``wire_u8`` bakes the [-1,1]->uint8 pixel quantization (exactly the mp4
    writers') INTO the exported module: quarter-size device->host transfers
    and no per-request host quantize — the r4 live-serving win, available to
    the AOT path too.  Recorded in the manifest as ``wire: "u8"``."""
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    length = length or (spec.first_stage.max_frames - 1)
    s = spec.first_stage.spatial_size
    zs = z_shape_of(spec)
    if student is not None:
        student_params, ds = student
        # the student replaces the flow reverse entirely —
        # forward_sample_student reads base params only through embed_cond
        # (poke_embedder/conditioner) and decode_first_stage; the flow tree
        # (~4.2 GB f32 at flagship width) would be dead weight in the
        # artifact, the server's load time, and serving HBM.  Prune it.
        base = {k: v for k, v in params.items() if k != "flow"}
        params = {"base": _canonicalize(base),
                  "student": _canonicalize(student_params)}
        run = _sample_fn_student(spec, ds, length)
    else:
        params = _canonicalize(params)
        run = _sample_fn(spec, length)
    if wire_u8:
        _run_f32 = run

        def run(p, x0, poke, z):  # noqa: F811 — quantized wire wrapper
            v = _run_f32(p, x0, poke, z)
            return jnp.clip((v + 1.0) * 127.5, 0.0, 255.0).astype(jnp.uint8)
    p_abs = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
    for b in buckets:
        args = (
            p_abs,
            jax.ShapeDtypeStruct((b, s, s, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, s, s, 2), jnp.float32),
            jax.ShapeDtypeStruct((b,) + zs, jnp.float32),
        )
        exp = jexport.export(
            jax.jit(run), platforms=tuple(platforms) if platforms else None
        )(*args)
        (out / f"sampler_b{b}.bin").write_bytes(bytes(exp.serialize()))
    ckpt_io.save(str(out / "params.npz"), params)
    manifest = {
        "format_version": FORMAT_VERSION,
        "sampler": ("direct_student" if student is not None else "flow"),
        "wire": "u8" if wire_u8 else "f32",
        "buckets": sorted(int(b) for b in buckets),
        "length": int(length),
        "x0_shape": [s, s, 3],
        "poke_shape": [s, s, 2],
        "z_shape": list(int(d) for d in zs),
        "platforms": list(platforms) if platforms else None,
        "jax_version": jax.__version__,
    }
    (out / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return out


class LoadedSampler:
    """A deserialized artifact: runnable sampler, no model code needed.

    ``run(params, x0, poke, z)`` requires x0.shape[0] to be an exported
    bucket (the batcher pads to buckets already); ``sample(x0, poke, seed)``
    is the one-request convenience that pads to the smallest bucket.
    """

    def __init__(self, path):
        path = pathlib.Path(path)
        m = json.loads((path / "manifest.json").read_text())
        if m["format_version"] != FORMAT_VERSION:
            raise ValueError(
                f"artifact format {m['format_version']} != supported {FORMAT_VERSION}"
            )
        self.manifest = m
        self.buckets = list(m["buckets"])
        self.length = int(m["length"])
        self.x0_shape = tuple(m["x0_shape"])
        self.poke_shape = tuple(m["poke_shape"])
        self.z_shape = tuple(m["z_shape"])
        self.params, _ = ckpt_io.load(str(path / "params.npz"))
        # jit-wrap each deserialized module: Exported.call re-traces its
        # call_exported invocation on EVERY call (~380 ms of host overhead
        # per batch, measured on the serving host — 426 ms/batch-16 step vs
        # 41 ms once wrapped, with the 7.9 MB output fetch itself only ~5 ms).
        # jax.jit caches the trace, so steady-state dispatch is XLA-fast.
        self._fns = {
            b: jax.jit(
                jexport.deserialize(
                    bytearray((path / f"sampler_b{b}.bin").read_bytes())
                ).call
            )
            for b in self.buckets
        }

    def run(self, params, x0, poke, z):
        b = int(x0.shape[0])
        if b not in self._fns:
            raise ValueError(f"batch {b} is not an exported bucket {self.buckets}")
        return self._fns[b](params, x0, poke, z)

    def draw_z(self, seeds):
        zs = [
            np.asarray(jax.random.normal(jax.random.PRNGKey(int(sd)), self.z_shape))
            for sd in seeds
        ]
        return jnp.asarray(np.stack(zs))

    def sample(self, x0, poke, seed: int = 0):
        """One request -> (T, S, S, 3) video (pads to the smallest bucket)."""
        b = self.buckets[0]
        x0b = jnp.zeros((b,) + self.x0_shape, jnp.float32).at[0].set(jnp.asarray(x0))
        pokeb = (
            jnp.zeros((b,) + self.poke_shape, jnp.float32).at[0].set(jnp.asarray(poke))
        )
        z = self.draw_z([seed] * b)
        return np.asarray(self.run(self.params, x0b, pokeb, z)[0])


def load_artifact(path) -> LoadedSampler:
    return LoadedSampler(path)


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    ex = sub.add_parser("export", help="export a serving artifact")
    ex.add_argument("-c", "--config", default=None)
    ex.add_argument("-m", "--model", default=None)
    ex.add_argument("--synth-model", default=None, metavar="REGISTRY_NAME")
    ex.add_argument("--out", required=True)
    ex.add_argument("--buckets", default="1,2,4,8")
    ex.add_argument("--length", type=int, default=None)
    ex.add_argument("--platforms", default=None, help="e.g. tpu,cpu")
    ex.add_argument("--platform", default=None, help="force jax backend")
    ex.add_argument("--student-ckpt", default=None,
                    help="export the distilled DIRECT sampler from this "
                         "checkpoint (bench_distill --save) instead of the "
                         "sequential flow reverse")
    ex.add_argument("--student-hidden", type=int, default=256)
    ex.add_argument("--student-depth", type=int, default=6)
    ex.add_argument("--student-synth", action="store_true",
                    help="synth student params (infra testing only)")
    ex.add_argument("--wire-u8", action="store_true",
                    help="bake the uint8 pixel wire into the exported module")
    vf = sub.add_parser("verify", help="load an artifact and run one sample")
    vf.add_argument("--dir", required=True)
    vf.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    if args.cmd == "export":
        from ipoke_tpu.serve.server import resolve_model

        params, spec = resolve_model(args.config, args.model, args.synth_model)
        student = None
        if args.student_ckpt or args.student_synth:
            from ipoke_tpu.train import distill

            ds = distill.DirectStudentSpec(hidden=args.student_hidden,
                                           depth=args.student_depth)
            if args.student_ckpt:
                sparams, smeta = ckpt_io.load(args.student_ckpt)
                if smeta and smeta.get("hidden"):
                    ds = distill.DirectStudentSpec(hidden=int(smeta["hidden"]),
                                                   depth=int(smeta["depth"]))
            else:
                from ipoke_tpu.utils.synth import synth_tree

                sparams = synth_tree(
                    lambda k: distill.init_direct(k, spec, ds),
                    jax.random.PRNGKey(5))
            student = (sparams, ds)
        out = export_sampler(
            params,
            spec,
            args.out,
            buckets=[int(b) for b in args.buckets.split(",")],
            length=args.length,
            platforms=args.platforms.split(",") if args.platforms else None,
            student=student,
            wire_u8=args.wire_u8,
        )
        print(f"exported artifact -> {out}")
    else:
        art = load_artifact(args.dir)
        x0 = np.zeros(art.x0_shape, np.float32)
        poke = np.zeros(art.poke_shape, np.float32)
        vid = art.sample(x0, poke, seed=0)
        assert np.isfinite(vid).all()
        print(
            f"artifact ok: buckets={art.buckets} video={vid.shape} "
            f"finite={bool(np.isfinite(vid).all())}"
        )


if __name__ == "__main__":
    main()
