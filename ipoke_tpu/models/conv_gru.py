"""Convolutional GRU (reference: models/modules/motion_models/rnn.py).

The reference unrolls the GRU in Python, recomputing everything per frame; we
expose a single-step ``cell``/``stack`` and let callers drive it through
``lax.scan`` (see models/first_stage.decode) so XLA compiles ONE step and the
whole T-frame unroll stays on-device.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ipoke_tpu.nn import core
from ipoke_tpu.nn.core import conv2d


def init_cell(key, input_size, hidden_size, kernel_size=3):
    ks = jax.random.split(key, 3)
    kk = kernel_size

    def gate(k):
        return {
            "w": core.orthogonal(k, (kk, kk, input_size + hidden_size, hidden_size)),
            "b": jnp.zeros((hidden_size,)),
        }

    return {"reset": gate(ks[0]), "update": gate(ks[1]), "out": gate(ks[2])}


def cell_apply(p, x, h, kernel_size=3):
    pad = kernel_size // 2
    stacked = jnp.concatenate([x, h], axis=-1)
    # reset + update read the SAME input with the SAME kernel geometry, so
    # they run as ONE dual-output conv (kernels concatenated on the output
    # axis) — per-channel bitwise-exact vs two separate convs, and one fewer
    # kernel launch per frame per layer (the same fusion as
    # nn/blocks.res_block_apply, VERDICT r4 next-step 6).  The small convs of
    # the decode path are launch-overhead/MXU-fill bound, not FLOP bound.
    hidden = p["reset"]["w"].shape[-1]
    w_ru = jnp.concatenate([p["reset"]["w"], p["update"]["w"]], axis=-1)
    b_ru = jnp.concatenate([p["reset"]["b"], p["update"]["b"]])
    ru = jax.nn.sigmoid(conv2d(stacked, w_ru, b_ru, padding=pad))
    reset, update = ru[..., :hidden], ru[..., hidden:]
    out_in = jnp.concatenate([x, h * reset], axis=-1)
    out = jnp.tanh(conv2d(out_in, p["out"]["w"], p["out"]["b"], padding=pad))
    return h * (1.0 - update) + out * update


def init_stack(key, input_size, hidden_size, n_layers, kernel_size=3):
    cells = []
    for i in range(n_layers):
        c_in = input_size if i == 0 else hidden_size
        cells.append(init_cell(jax.random.fold_in(key, i), c_in, hidden_size, kernel_size))
    return cells


def stack_apply(cells, x, hidden, kernel_size=3):
    """hidden: list of (B,H,W,C) states (one per layer).  Returns new list."""
    new_hidden = []
    inp = x
    for cell, h in zip(cells, hidden):
        h_new = cell_apply(cell, inp, h, kernel_size)
        new_hidden.append(h_new)
        inp = h_new
    return new_hidden
