"""utils/synth.py: host-side zero-compile parameter synthesis.

The benchmarks depend on two invariants here: permutation-buffer int leaves
must be valid permutations (gather semantics), and optimizer-state floats
must be zeros — a random fill puts negative values into Adam's second
moments and the first update turns the whole state NaN via sqrt(nu) (found
on the stage-1 GAN bench; see synth_tree docstring).
"""
import jax
import jax.numpy as jnp
import numpy as np

from ipoke_tpu.utils.synth import synth_tree


def _init(key):
    return {
        "w": jax.random.normal(key, (4, 3)),
        "perm": jnp.stack([jnp.arange(6, dtype=jnp.int32)] * 2),
        "count": jnp.zeros((), jnp.int32),
    }


def test_synth_tree_fills():
    t = synth_tree(_init, jax.random.PRNGKey(0))
    assert t["w"].shape == (4, 3) and float(jnp.std(t["w"])) > 0
    perm = np.asarray(t["perm"])
    for row in perm:
        assert sorted(row.tolist()) == list(range(6))
    assert t["count"].shape == () and int(t["count"]) == 0


def test_synth_tree_device_fill_matches_host_contract():
    """on_device=True fills on the default device with the same invariants:
    random floats, valid permutation rows, zero int counters, bf16 dtypes
    honored."""
    def init(key):
        t = _init(key)
        t["wb"] = jnp.zeros((3, 2), jnp.bfloat16)
        return t

    t = synth_tree(init, jax.random.PRNGKey(0), on_device=True)
    assert t["w"].shape == (4, 3) and float(jnp.std(t["w"])) > 0
    assert t["wb"].dtype == jnp.bfloat16 and float(jnp.std(t["wb"].astype(jnp.float32))) > 0
    for row in np.asarray(t["perm"]):
        assert sorted(row.tolist()) == list(range(6))
    assert int(t["count"]) == 0
    # zero fill stays zero on the device path too
    z = synth_tree(init, jax.random.PRNGKey(0), on_device=True, float_fill="zeros")
    assert float(jnp.max(jnp.abs(z["w"]))) == 0.0


def test_synth_tree_device_fill_multi_group(monkeypatch):
    """Large trees fill in bounded chunks (one jit per group) — a single
    flat draw overflows a uint32 buffer-table entry in the TPU runtime.
    Shrink the chunk so this small tree spans several groups and call the
    device path directly (synth_tree's host fallback would mask a crash)."""
    from ipoke_tpu.utils import synth

    monkeypatch.setattr(synth, "_FILL_CHUNK_ELEMS", 16)

    def init(key):
        return {
            "a": jnp.zeros((3, 4)),
            "big": jnp.zeros((6, 7)),  # 42 > 16: a group of its own
            "c": jnp.zeros((2,), jnp.bfloat16),
            "perm": jnp.stack([jnp.arange(6, dtype=jnp.int32)] * 2),
        }

    t = synth._synth_tree_device(init, jax.random.PRNGKey(0), seed=0)
    assert t["a"].shape == (3, 4) and float(jnp.std(t["a"])) > 0
    assert t["big"].shape == (6, 7) and float(jnp.std(t["big"])) > 0
    assert t["c"].dtype == jnp.bfloat16
    # distinct groups draw from fold_in'd keys, not recycled values
    assert not np.allclose(np.asarray(t["a"]).ravel()[:12],
                           np.asarray(t["big"]).ravel()[:12])
    for row in np.asarray(t["perm"]):
        assert sorted(row.tolist()) == list(range(6))
    # zero fill honors chunking too
    z = synth._synth_tree_device(init, jax.random.PRNGKey(0), seed=0,
                                 float_fill="zeros")
    assert float(jnp.max(jnp.abs(z["a"]))) == 0.0


def test_synth_tree_zero_fill_for_opt_states():
    import optax

    params = {"w": jnp.ones((4, 3))}
    opt = optax.adam(1e-3)
    st = synth_tree(lambda: opt.init(params), float_fill="zeros")
    for leaf in jax.tree_util.tree_leaves(st):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert float(jnp.max(jnp.abs(leaf))) == 0.0
    # a real update through the synthesized state stays finite
    g = {"w": jnp.ones((4, 3))}
    up, _ = opt.update(g, st, params)
    assert bool(jnp.all(jnp.isfinite(up["w"])))
