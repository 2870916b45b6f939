"""Interactive / scripted poke synthesis — the GUI-equivalent driver
(reference: testing/gui.py PyQt app; this environment is headless, so the
same model-facing API (testing/gui.py:120-150 Form.forward) is exposed as a
session object + a scripted CLI:

    python -m ipoke_tpu.eval.interactive --config <cfg> -m <name> \
        --pokes '[{"x": 64, "y": 40, "dx": 8, "dy": -3}]' --length 16

Pokes are given in display coordinates (display_size from the ui: config
section) and rescaled to model resolution like the GUI does
(testing/gui.py:326-350)."""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.data.poke import poke_from_coords
from ipoke_tpu.models import second_stage as model_ss
from ipoke_tpu.utils.video import enrollment, save_image, save_video


class InteractiveSession:
    """Holds a loaded second-stage model + one start frame; generates videos
    from user pokes with arbitrary unroll length (the GRU extrapolates beyond
    the trained horizon — second_stage_video.py:361-382)."""

    def __init__(self, params, spec, display_size=256, fixed_seed=False):
        self.params = params
        self.spec = spec
        self.display_size = display_size
        self.fixed_seed = fixed_seed
        self._rng = jax.random.PRNGKey(42)
        self._sample = None
        self._length = None

    def set_image(self, image):
        """image: (H, W, 3) in [-1, 1] at model resolution."""
        self.image = np.asarray(image, np.float32)

    def _compile(self, length):
        if self._sample is not None and self._length == length:
            return
        spec = self.spec

        @jax.jit
        def sample(params, x0, poke, key):
            cond = model_ss.embed_cond(params, spec, x0, poke)
            from ipoke_tpu.flows import transformer

            z = jax.random.normal(
                key,
                transformer.reverse_input_shape(
                    spec.flow, x0.shape[0], spec.latent_size, spec.flow_in_channels
                ),
                x0.dtype,
            )

            motion = transformer.reverse(params["flow"], spec.flow, z, cond)
            if spec.augment_channels:
                motion = motion[..., : -spec.augment_channels]
            return model_ss.decode_first_stage(params, spec, motion, x0, length)

        self._sample = sample
        self._length = length

    def generate(self, pokes, length=None, poke_size=5):
        """pokes: list of dicts {x, y, dx, dy} in display coords; an empty
        list yields a zero poke map (background / 'no drag' generation)."""
        size = self.image.shape[0]
        scale = size / self.display_size
        if pokes:
            coords = np.array([[p["y"] * scale, p["x"] * scale] for p in pokes])
            disps = np.array([[p["dy"] * scale, p["dx"] * scale] for p in pokes])
            poke = poke_from_coords((size, size), coords, disps, poke_size=poke_size)
        else:
            poke = np.zeros((size, size, 2), np.float32)
        length = length or self.spec.first_stage.max_frames - 1
        self._compile(length)
        if not self.fixed_seed:
            self._rng, key = jax.random.split(self._rng)
        else:
            key = jax.random.PRNGKey(42)
        vid = self._sample(
            self.params, jnp.asarray(self.image[None]), jnp.asarray(poke[None]), key
        )
        return np.asarray(vid[0]), poke


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", default="configs/second_stage.yaml")
    ap.add_argument("-m", "--model_name", required=True)
    ap.add_argument("--pokes", required=True, help='JSON list of {"x","y","dx","dy"}')
    ap.add_argument("--length", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--example", type=int, default=0)
    args = ap.parse_args()

    from ipoke_tpu.config import load_parameters
    from ipoke_tpu.experiments.second_stage import SecondStageExperiment

    config, dirs = load_parameters(args.config, args.model_name, test_mode="samples")
    exp = SecondStageExperiment(config, dirs)
    params = exp._load_for_test()
    ui = config.get("ui", {})
    sess = InteractiveSession(params, exp.spec, display_size=int(ui.get("display_size", 256)))
    exp.datamod.setup()
    example = exp.datamod.datasets["test"][args.example]
    sess.set_image(example["images"][0])
    vid, poke = sess.generate(json.loads(args.pokes), length=args.length)
    out = args.out or os.path.join(
        dirs["generated"], "interactive", time.strftime("%Y-%m-%d_%H-%M-%S")
    )
    clip = np.concatenate([sess.image[None], vid], 0)
    save_video(clip, os.path.join(out, "generated.mp4"))
    save_image(enrollment(clip), os.path.join(out, "enrollment.png"))
    print(json.dumps({"frames": int(vid.shape[0]), "out": out}))


if __name__ == "__main__":
    main()
