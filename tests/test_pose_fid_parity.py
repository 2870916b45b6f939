"""Parity/shape tests for the auxiliary metric nets (VERDICT r1 weak #1):

- pose_resnet: the reference submodule (models/pose_estimator) is not checked
  out in this environment, so the standard simple-baselines pose_resnet
  architecture is rebuilt here from plain torch primitives (the submodule is
  a vendored copy of github.com/microsoft/human-pose-estimation.pytorch) and
  compared against metrics/pose.py after convert_pose_resnet.
- FID InceptionV3: torchvision is absent, so stem geometry and finiteness
  are checked with random weights.  Reference quirk (ADVICE r2): torchvision
  0.8.x keeps the stem max pools FUNCTIONAL (not in ``_modules``), so the
  reference's injected avg pools REPLACE them — standard 35x35 Mixed
  geometry, avg instead of max downsampling.
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from ipoke_tpu.ckpt.torch_import import convert_pose_resnet  # noqa: E402


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        res = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + res)


class _PoseResNet(nn.Module):
    """simple-baselines pose_resnet (lib/models/pose_resnet.py layout)."""

    def __init__(self, layers=(3, 4, 6, 3), n_joints=17):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], 2)
        self.layer3 = self._make_layer(256, layers[2], 2)
        self.layer4 = self._make_layer(512, layers[3], 2)
        deconvs = []
        inp = 2048
        for _ in range(3):
            deconvs += [
                nn.ConvTranspose2d(inp, 256, 4, 2, 1, output_padding=0, bias=False),
                nn.BatchNorm2d(256), nn.ReLU(inplace=True),
            ]
            inp = 256
        self.deconv_layers = nn.Sequential(*deconvs)
        self.final_layer = nn.Conv2d(256, n_joints, 1)

    def _make_layer(self, planes, blocks, stride=1):
        down = None
        if stride != 1 or self.inplanes != planes * 4:
            down = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        layers = [_Bottleneck(self.inplanes, planes, stride, down)]
        self.inplanes = planes * 4
        layers += [_Bottleneck(self.inplanes, planes) for _ in range(1, blocks)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.final_layer(self.deconv_layers(x))


def test_pose_resnet_parity(tmp_path, monkeypatch):
    from ipoke_tpu.metrics import pose

    torch.manual_seed(50)
    m = _PoseResNet(layers=(3, 4, 6, 3)).eval()
    g = torch.Generator().manual_seed(51)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.copy_(0.1 * torch.randn(mod.running_mean.shape, generator=g))
                mod.running_var.copy_(0.5 + torch.rand(mod.running_var.shape, generator=g))
                mod.weight.copy_(1 + 0.2 * torch.randn(mod.weight.shape, generator=g))
                mod.bias.copy_(0.2 * torch.randn(mod.bias.shape, generator=g))
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    path = tmp_path / "pose_resnet_152.npz"
    convert_pose_resnet(sd, str(path), depth=50)

    monkeypatch.setenv("IPOKE_WEIGHTS", str(tmp_path))
    pose.load_params.cache_clear()

    img01 = torch.rand(2, 3, 256, 256, generator=torch.Generator().manual_seed(52))
    with torch.no_grad():
        hm_ref = m((img01 - torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1))
                   / torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)).numpy()
    img_jax = jnp.asarray(np.transpose(img01.numpy(), (0, 2, 3, 1))) * 2.0 - 1.0
    hm = pose.heatmaps(img_jax, depth=50)
    pose.load_params.cache_clear()
    got = np.transpose(np.asarray(hm), (0, 3, 1, 2))
    assert got.shape == hm_ref.shape, f"{got.shape} vs {hm_ref.shape}"
    err = np.max(np.abs(got - hm_ref)) / (np.max(np.abs(hm_ref)) + 1e-8)
    assert err < 1e-3, f"pose heatmaps rel err {err:.2e}"


def test_fid_stem_shapes_and_finiteness():
    """Stem has avg pools replacing (not accompanying) the max pools —
    standard 35x35 Mixed geometry — and pool3 features are finite."""
    from ipoke_tpu.metrics import fid

    stem = fid._stem()
    assert [it[0] for it in stem].count("AVGPOOL") == 2
    assert all(it[0] != "MAXPOOL" for it in stem)
    # spatial arithmetic at 299 input: each entry is (name,kh,kw,ci,co,s,pad)
    size = 299
    for name, kh, kw, ci, co, s, pad in stem:
        size = (size + 2 * (pad if isinstance(pad, int) else pad[0]) - kh) // s + 1
    assert size == 35, f"Mixed blocks must see 35x35, got {size}"

    imgs = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    feats = fid.pool3_features(imgs)
    assert feats.shape == (2, 2048)
    assert bool(jnp.isfinite(feats).all())
