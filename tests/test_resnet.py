"""ResNet-50 parity: flax NHWC tower vs a torch ResNet v1 built with
torchvision's exact module naming, weights via import_torchvision_resnet50.

(torchvision itself is not installed in this image; the torch mirror below
reproduces its resnet50 topology and state_dict key layout, so the importer
is validated against the real naming scheme.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from clip_for_dl_tpu.models.resnet import (
    ResNet,
    import_torchvision_resnet50,
    resnet50,
)

torch.manual_seed(0)


class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet(tnn.Module):
    def __init__(self, layers=(3, 4, 6, 3)):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], 2)
        self.layer3 = self._make_layer(256, layers[2], 2)
        self.layer4 = self._make_layer(512, layers[3], 2)
        self.avgpool = tnn.AdaptiveAvgPool2d(1)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = tnn.Sequential(
            tnn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
            tnn.BatchNorm2d(planes * 4),
        )
        layers = [TorchBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(TorchBottleneck(self.inplanes, planes))
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        return torch.flatten(self.avgpool(x), 1)


def _randomize_bn_stats(model):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)


def test_resnet50_eval_parity(rng):
    tmod = TorchResNet()
    _randomize_bn_stats(tmod)
    tmod.eval()
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(x)).numpy()

    params, stats = import_torchvision_resnet50(tmod.state_dict())
    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, stats),
    }
    got = resnet50().apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    assert got.shape == (2, 2048)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)


def test_resnet_capture_stage4_shape(rng):
    model = ResNet(stage_sizes=(1, 1, 1, 1))
    x = jnp.asarray(rng.standard_normal((1, 224, 224, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    pooled, stage4 = model.apply(variables, x, capture_stage4=True)
    assert pooled.shape == (1, 2048)
    assert stage4.shape == (1, 7, 7, 2048)


def test_resnet_train_mode_updates_batch_stats(rng):
    model = ResNet(stage_sizes=(1, 1, 1, 1))
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    _, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    before = variables["batch_stats"]["bn1"]["mean"]
    after = mutated["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))
