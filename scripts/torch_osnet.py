#!/usr/bin/env python3
"""Torch-side OSNet mirroring the torchreid module layout.

Purpose: deterministic validation of the torch->Flax weight conversion
(motcpp_tpu.appearance.osnet.convert_torch_state_dict) without network
access. The module NAMES (conv1.conv, conv2.0.conv2b.1.bn, gate.fc1,
fc.0, ...) reproduce torchreid's ``osnet.py`` state_dict layout exactly,
so a state_dict produced here is key-compatible with real
``osnet_x1_0``-family checkpoints from the torchreid model zoo — and the
converter + parity test (tests/test_appearance.py) therefore validate
the real-checkpoint path end to end.

Equivalent role to the reference's export-side torch model (reference:
scripts/export_reid_onnx.py builds the torchreid model to export ONNX).
This is an original implementation of the public OSNet architecture
(Zhou et al., ICCV 2019), not a copy of torchreid.

Usage (state_dict generator for tests / conversion dry-runs):
    python scripts/torch_osnet.py <out.pt> [x1_0|x0_25]
"""

from __future__ import annotations

import sys

import torch
import torch.nn as nn


class ConvLayer(nn.Module):
    def __init__(self, in_c, out_c, k, stride=1, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(
            in_c, out_c, k, stride=stride, padding=padding, bias=False
        )
        self.bn = nn.BatchNorm2d(out_c)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        return self.relu(self.bn(self.conv(x)))


class Conv1x1(nn.Module):
    def __init__(self, in_c, out_c):
        super().__init__()
        self.conv = nn.Conv2d(in_c, out_c, 1, stride=1, padding=0, bias=False)
        self.bn = nn.BatchNorm2d(out_c)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        return self.relu(self.bn(self.conv(x)))


class Conv1x1Linear(nn.Module):
    def __init__(self, in_c, out_c):
        super().__init__()
        self.conv = nn.Conv2d(in_c, out_c, 1, stride=1, padding=0, bias=False)
        self.bn = nn.BatchNorm2d(out_c)

    def forward(self, x):
        return self.bn(self.conv(x))


class LightConv3x3(nn.Module):
    def __init__(self, in_c, out_c):
        super().__init__()
        self.conv1 = nn.Conv2d(in_c, out_c, 1, stride=1, padding=0, bias=False)
        self.conv2 = nn.Conv2d(
            out_c, out_c, 3, stride=1, padding=1, bias=False, groups=out_c
        )
        self.bn = nn.BatchNorm2d(out_c)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        return self.relu(self.bn(self.conv2(self.conv1(x))))


class ChannelGate(nn.Module):
    def __init__(self, in_c, reduction=16):
        super().__init__()
        self.global_avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Conv2d(in_c, in_c // reduction, 1, bias=True, padding=0)
        self.relu = nn.ReLU(inplace=True)
        self.fc2 = nn.Conv2d(in_c // reduction, in_c, 1, bias=True, padding=0)

    def forward(self, x):
        inp = x
        x = self.global_avgpool(x)
        x = self.relu(self.fc1(x))
        x = torch.sigmoid(self.fc2(x))
        return inp * x


class OSBlock(nn.Module):
    def __init__(self, in_c, out_c, bottleneck_reduction=4):
        super().__init__()
        mid = out_c // bottleneck_reduction
        self.conv1 = Conv1x1(in_c, mid)
        self.conv2a = LightConv3x3(mid, mid)
        self.conv2b = nn.Sequential(
            LightConv3x3(mid, mid), LightConv3x3(mid, mid)
        )
        self.conv2c = nn.Sequential(
            LightConv3x3(mid, mid),
            LightConv3x3(mid, mid),
            LightConv3x3(mid, mid),
        )
        self.conv2d = nn.Sequential(
            LightConv3x3(mid, mid),
            LightConv3x3(mid, mid),
            LightConv3x3(mid, mid),
            LightConv3x3(mid, mid),
        )
        self.gate = ChannelGate(mid)
        self.conv3 = Conv1x1Linear(mid, out_c)
        self.downsample = None
        if in_c != out_c:
            self.downsample = Conv1x1Linear(in_c, out_c)

    def forward(self, x):
        identity = x
        x1 = self.conv1(x)
        x2 = (
            self.gate(self.conv2a(x1))
            + self.gate(self.conv2b(x1))
            + self.gate(self.conv2c(x1))
            + self.gate(self.conv2d(x1))
        )
        x3 = self.conv3(x2)
        if self.downsample is not None:
            identity = self.downsample(identity)
        return torch.relu(x3 + identity)


class OSNet(nn.Module):
    def __init__(self, channels=(64, 256, 384, 512), feature_dim=512,
                 num_classes=751):
        super().__init__()
        c1, c2, c3, c4 = channels
        self.conv1 = ConvLayer(3, c1, 7, stride=2, padding=3)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.conv2 = nn.Sequential(
            OSBlock(c1, c2),
            OSBlock(c2, c2),
            nn.Sequential(Conv1x1(c2, c2), nn.AvgPool2d(2, stride=2)),
        )
        self.conv3 = nn.Sequential(
            OSBlock(c2, c3),
            OSBlock(c3, c3),
            nn.Sequential(Conv1x1(c3, c3), nn.AvgPool2d(2, stride=2)),
        )
        self.conv4 = nn.Sequential(OSBlock(c3, c4), OSBlock(c4, c4))
        self.conv5 = Conv1x1(c4, c4)
        self.global_avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Sequential(
            nn.Linear(c4, feature_dim),
            nn.BatchNorm1d(feature_dim),
            nn.ReLU(inplace=True),
        )
        self.classifier = nn.Linear(feature_dim, num_classes)

    def forward(self, x):
        x = self.maxpool(self.conv1(x))
        x = self.conv2(x)
        x = self.conv3(x)
        x = self.conv4(x)
        x = self.conv5(x)
        v = self.global_avgpool(x).flatten(1)
        v = self.fc(v)
        if self.training:
            return self.classifier(v)
        return v


def osnet_x1_0(**kw):
    return OSNet(channels=(64, 256, 384, 512), **kw)


def osnet_x0_25(**kw):
    return OSNet(channels=(16, 64, 96, 128), **kw)


def randomize_(model: OSNet, seed: int = 0) -> OSNet:
    """Randomize ALL tensors including BN running stats (so conversion
    tests catch batch_stats mapping errors, not just params) —
    VARIANCE-PRESERVING, so the network stays input-discriminative.

    The first fixture used N(0, 0.05) for every parameter, which set
    every BN gamma to ~0.05: 20+ stacked BN layers attenuated the
    input-dependent signal by 0.05^depth to ~1e-10, leaving only the
    constant beta terms — all crops mapped to the SAME embedding
    (cosine 1.0) and the tracking golden never exercised appearance
    association. Kaiming-scaled convs + gamma ~ U(0.8, 1.2) keep
    activation variance alive through depth; embedding discrimination
    is asserted in tests/test_reid_fixture.py.
    """
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.dim() >= 2:  # conv / linear weights: kaiming-scaled
                fan_in = p[0].numel()
                p.normal_(0.0, (2.0 / max(fan_in, 1)) ** 0.5,
                          generator=gen)
            elif name.endswith(".weight"):  # BN gamma: near 1
                p.uniform_(0.8, 1.2, generator=gen)
            else:  # BN beta / biases: small
                p.normal_(0.0, 0.1, generator=gen)
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.normal_(0.0, 0.3, generator=gen)
            elif name.endswith("running_var"):
                b.uniform_(0.5, 2.0, generator=gen)
    return model


def calibrate_(model: OSNet, seed: int = 1, steps: int = 12,
               batch: int = 16, hw=(256, 128)) -> OSNet:
    """Adapt BN running stats to the network's ACTUAL activation
    statistics via train-mode forward passes (what training does for
    real checkpoints). Without this, eval-mode BN leaves a per-layer
    common mode that swamps the input-dependent signal over depth —
    every crop then maps to cosine-1.0 embeddings and the fixture can't
    exercise appearance association."""
    gen = torch.Generator().manual_seed(seed)
    model.train()
    with torch.no_grad():
        for _ in range(steps):
            x = torch.rand((batch, 3, *hw), generator=gen) * 2.0 - 1.0
            model(x)
    model.eval()
    return model


def pretrain_(model: OSNet, seed: int = 2, steps: int = 50,
              n_ids: int = 8, hw=(256, 128)) -> OSNet:
    """Brief deterministic contrastive pretrain on synthetic identity
    textures, so the fixture's embeddings genuinely DISCRIMINATE (two
    views of the same texture land closer than different textures).

    An untrained CNN maps all natural-statistics crops to near-cosine-1
    embeddings (margins ~1e-4, ordering unstable), which would leave
    the tracking golden's appearance association running on numerical
    noise. ~50 InfoNCE steps on 8 identities are enough to open the
    margin to >0.1 while keeping generation under a couple of CPU
    minutes; everything is generator-seeded for reproducibility.
    """
    gen = torch.Generator().manual_seed(seed)
    ids = torch.rand((n_ids, 3, 8, 4), generator=gen)  # coarse textures
    opt = torch.optim.SGD(model.parameters(), lr=0.05, momentum=0.9)
    model.train()
    for _ in range(steps):
        views = []
        for _v in range(2):
            x = torch.nn.functional.interpolate(
                ids, size=hw, mode="bilinear", align_corners=False
            )
            x = x + 0.1 * torch.randn(x.shape, generator=gen)
            views.append(x)
        x = torch.cat(views, 0)  # (2*n_ids, 3, H, W)
        f = model(x)
        f = torch.nn.functional.normalize(f, dim=1)
        logits = f @ f.t() / 0.2
        logits.fill_diagonal_(-1e9)
        target = torch.arange(2 * n_ids)
        target = (target + n_ids) % (2 * n_ids)  # positive = other view
        loss = torch.nn.functional.cross_entropy(logits, target)
        opt.zero_grad()
        loss.backward()
        opt.step()
    model.eval()
    return model


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 1
    out = argv[0]
    variant = argv[1] if len(argv) > 1 else "x1_0"
    model = {"x1_0": osnet_x1_0, "x0_25": osnet_x0_25}[variant]()
    randomize_(model)
    calibrate_(model)
    if "--no-pretrain" not in argv:
        pretrain_(model)
    torch.save(model.state_dict(), out)
    print(f"wrote {out} ({sum(p.numel() for p in model.parameters())} params)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
