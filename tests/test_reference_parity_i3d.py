"""Golden parity for the FVD feature extractor: JAX I3D vs the reference
PyTorch I3D (utils/metrics.py:999-1105) built on CPU with random weights.

Validates the TF-SAME stride-aware padding (every strided unit shifts if the
padding formula is wrong), the BN-folding converter (convert_i3d), the
preprocessing (bilinear align-corners resize + [-1,1]->[0,1] denorm), and the
AvgPool3d((2,7,7)) head semantics.
"""
import os
import sys

import numpy as np
import pytest

REF = os.environ.get("IPOKE_REFERENCE", "/root/reference")
if not os.path.isdir(os.path.join(REF, "utils")):
    pytest.skip("reference repo not mounted", allow_module_level=True)
torch = pytest.importorskip("torch")
if REF not in sys.path:
    sys.path.insert(0, REF)

# utils/metrics.py imports deps absent here (pytorch_lightning 1.1.7 API,
# torchvision, lpips, and the wandb-heavy utils.logging).  The I3D classes we
# test are pure torch; stub the rest so the module imports.
import types  # noqa: E402


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


class _StubMetric:
    def __init__(self, *a, **k):
        pass

    def add_state(self, *a, **k):
        pass


for _m in ("pytorch_lightning", "torchvision", "lpips"):
    try:
        __import__(_m)
    except ImportError:
        if _m == "pytorch_lightning":
            pl = _stub("pytorch_lightning")
            pm = _stub("pytorch_lightning.metrics", Metric=_StubMetric)
            pm.functional = _stub(
                "pytorch_lightning.metrics.functional", ssim=None, psnr=None
            )
            pl.metrics = pm
        elif _m == "torchvision":
            tv = _stub("torchvision")
            tv.models = _stub("torchvision.models", inception_v3=None)
        else:
            _stub("lpips", LPIPS=object)
sys.modules.setdefault(
    "utils.logging", _stub("utils.logging", make_nn_var_plot=None)
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ipoke_tpu.ckpt.torch_import import convert_i3d  # noqa: E402
from ipoke_tpu.metrics import i3d  # noqa: E402


@pytest.fixture(scope="module")
def ref_i3d():
    from utils.metrics import I3D

    torch.manual_seed(40)
    m = I3D(400, "rgb").eval()
    # randomize BN buffers/affine so the fold is actually exercised
    g = torch.Generator().manual_seed(41)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm3d):
                mod.weight.copy_(1 + 0.2 * torch.randn(mod.weight.shape, generator=g))
                mod.bias.copy_(0.2 * torch.randn(mod.bias.shape, generator=g))
                mod.running_mean.copy_(0.1 * torch.randn(mod.running_mean.shape, generator=g))
                mod.running_var.copy_(0.5 + torch.rand(mod.running_var.shape, generator=g))
    return m


@pytest.fixture(scope="module")
def jax_params(ref_i3d, tmp_path_factory):
    sd = {k: v.numpy() for k, v in ref_i3d.state_dict().items()}
    path = tmp_path_factory.mktemp("w") / "i3d_kinetics_rgb.npz"
    convert_i3d(sd, str(path))
    data = np.load(path)
    params = {}
    for name, ci, co, k in i3d._unit_names():
        key = name.replace("/", ".")
        params[name] = {"w": np.asarray(data[f"{key}.w"]), "b": np.asarray(data[f"{key}.b"])}
    return params


def _rel_err(a, b):
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-8)


def test_i3d_logits_224(ref_i3d, jax_params):
    """224 input, no resize: isolates the network (padding + BN fold)."""
    g = torch.Generator().manual_seed(42)
    vid01 = torch.rand(2, 10, 3, 224, 224, generator=g)  # [0,1] like the ref pipeline
    with torch.no_grad():
        _, logits_ref = ref_i3d(vid01.permute(0, 2, 1, 3, 4))
    vid_jax = jnp.asarray(np.transpose(vid01.numpy(), (0, 1, 3, 4, 2))) * 2.0 - 1.0
    feats = i3d.features(vid_jax, jax_params)
    err = _rel_err(np.asarray(feats), logits_ref.numpy())
    assert err < 2e-3, f"i3d 224 logits rel err {err:.2e}"


def test_i3d_logits_with_resize(ref_i3d, jax_params):
    """64 input through each side's full preprocess (resize parity)."""
    from utils.metrics import preprocess

    g = torch.Generator().manual_seed(43)
    vid = torch.rand(2, 10, 3, 64, 64, generator=g) * 2.0 - 1.0  # [-1,1]
    with torch.no_grad():
        prep, _ = preprocess(vid, vid.clone())
        _, logits_ref = ref_i3d(prep.permute(0, 2, 1, 3, 4))
    vid_jax = jnp.asarray(np.transpose(vid.numpy(), (0, 1, 3, 4, 2)))
    feats = i3d.features(vid_jax, jax_params)
    err = _rel_err(np.asarray(feats), logits_ref.numpy())
    assert err < 2e-3, f"i3d resized logits rel err {err:.2e}"


def test_i3d_layer_trace(ref_i3d, jax_params):
    """Layerwise shape + activation check through the strided trunk — catches
    which unit diverges rather than only the final logits."""
    g = torch.Generator().manual_seed(44)
    vid01 = torch.rand(1, 10, 3, 224, 224, generator=g)
    x_t = vid01.permute(0, 2, 1, 3, 4)

    acts = {}

    def hook(name):
        def fn(_m, _i, out):
            acts[name] = out.detach().numpy()
        return fn

    hooks = [
        ref_i3d.conv3d_1a_7x7.register_forward_hook(hook("conv1")),
        ref_i3d.maxPool3d_2a_3x3.register_forward_hook(hook("pool2a")),
        ref_i3d.mixed_3b.register_forward_hook(hook("mixed3b")),
        ref_i3d.maxPool3d_4a_3x3.register_forward_hook(hook("pool4a")),
        ref_i3d.maxPool3d_5a_2x2.register_forward_hook(hook("pool5a")),
        ref_i3d.mixed_5c.register_forward_hook(hook("mixed5c")),
    ]
    with torch.no_grad():
        ref_i3d(x_t)
    for h in hooks:
        h.remove()

    p = jax_params
    x = jnp.asarray(np.transpose(vid01.numpy(), (0, 1, 3, 4, 2)))
    x = i3d._unit(p["Conv3d_1a_7x7"], x, stride=2)
    mine = {"conv1": x}
    x = i3d._maxpool(x, (1, 3, 3), (1, 2, 2))
    mine["pool2a"] = x
    x = i3d._unit(p["Conv3d_2b_1x1"], x)
    x = i3d._unit(p["Conv3d_2c_3x3"], x)
    x = i3d._maxpool(x, (1, 3, 3), (1, 2, 2))
    x = i3d._inception(p, "Mixed_3b", x)
    mine["mixed3b"] = x
    x = i3d._inception(p, "Mixed_3c", x)
    x = i3d._maxpool(x, (3, 3, 3), (2, 2, 2))
    mine["pool4a"] = x
    for blk in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
        x = i3d._inception(p, blk, x)
    x = i3d._maxpool(x, (2, 2, 2), (2, 2, 2))
    mine["pool5a"] = x
    x = i3d._inception(p, "Mixed_5b", x)
    x = i3d._inception(p, "Mixed_5c", x)
    mine["mixed5c"] = x

    for name, ref in acts.items():
        got = np.transpose(np.asarray(mine[name]), (0, 4, 1, 2, 3))  # NDHWC->NCDHW
        assert got.shape == ref.shape, f"{name}: {got.shape} vs {ref.shape}"
        err = _rel_err(got, ref)
        assert err < 1e-3, f"{name}: rel err {err:.2e}"
