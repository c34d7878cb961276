"""Parity: flax ResNet/FPN vs an independent torch implementation.

Builds a torch ResNet-18 (independent of the reference code), copies its
weights through the converter, and compares activations — this pins down
NHWC conv semantics, stride-2 padding alignment, BN eval behavior and the
OIHW->HWIO transposes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from s2anet_tpu.models.resnet import ResNetBackbone
from s2anet_tpu.models.torch_import import convert_torch_resnet


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout),
            )

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + r)


class TorchResNet18Feat(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        chans = [64, 128, 256, 512]
        layers = []
        cin = 64
        for s, c in enumerate(chans):
            stride = 1 if s == 0 else 2
            layers.append(
                tnn.Sequential(
                    TorchBasicBlock(cin, c, stride), TorchBasicBlock(c, c)
                )
            )
            cin = c
        self.layer1, self.layer2, self.layer3, self.layer4 = layers

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c3, c4, c5


def _torchvision_style_state_dict(model):
    sd = {}
    for k, v in model.state_dict().items():
        k = k.replace("downsample.0", "downsample.0").replace(
            "downsample.1", "downsample.1"
        )
        # layerX.Y.mod -> torchvision names already match this structure
        sd[k] = v
    return sd


@pytest.mark.slow
def test_resnet18_matches_torch(rng):
    torch.manual_seed(0)
    tmodel = TorchResNet18Feat().eval()
    # randomize BN stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1, 0.2)
                m.bias.normal_(0, 0.2)

    sd = _torchvision_style_state_dict(tmodel)
    params, stats = convert_torch_resnet(sd, "resnet18")

    x = rng.normal(size=(1, 3, 66, 66)).astype(np.float32)
    with torch.no_grad():
        c3_t, c4_t, c5_t = tmodel(torch.tensor(x))

    fmodel = ResNetBackbone(arch="resnet18")
    out = fmodel.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        train=False,
    )
    for got, want in zip(out, (c3_t, c4_t, c5_t)):
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        want = want.numpy()
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
