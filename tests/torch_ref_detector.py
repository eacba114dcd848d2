"""Minimal PyTorch mirrors of the detector components (torchvision
maskrcnn_resnet50_fpn semantics + state_dict naming) — golden oracles for
tests/test_detector_parity.py."""

import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchBottleneck(nn.Module):
    def __init__(self, cin, width, stride=1):
        super().__init__()
        cout = width * 4
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idt)


class TorchResNet50Stages(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        sizes = [3, 4, 6, 3]
        widths = [64, 128, 256, 512]
        cin = 64
        for s, (n, w) in enumerate(zip(sizes, widths)):
            blocks = []
            for b in range(n):
                stride = 2 if (s > 0 and b == 0) else 1
                blocks.append(TorchBottleneck(cin, w, stride))
                cin = w * 4
            setattr(self, f"layer{s+1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        taps = []
        for s in range(1, 5):
            x = getattr(self, f"layer{s}")(x)
            taps.append(x)
        return taps  # C2..C5


class TorchFPN(nn.Module):
    """Legacy flat naming: inner_blocks.N / layer_blocks.N."""

    def __init__(self, in_channels=(256, 512, 1024, 2048), out=256):
        super().__init__()
        self.inner_blocks = nn.ModuleList(
            [nn.Conv2d(c, out, 1) for c in in_channels]
        )
        self.layer_blocks = nn.ModuleList(
            [nn.Conv2d(out, out, 3, padding=1) for _ in in_channels]
        )

    def forward(self, feats):
        laterals = [m(f) for m, f in zip(self.inner_blocks, feats)]
        p5 = laterals[3]
        p4 = laterals[2] + F.interpolate(p5, size=laterals[2].shape[-2:], mode="nearest")
        p3 = laterals[1] + F.interpolate(p4, size=laterals[1].shape[-2:], mode="nearest")
        p2 = laterals[0] + F.interpolate(p3, size=laterals[0].shape[-2:], mode="nearest")
        outs = [m(p) for m, p in zip(self.layer_blocks, (p2, p3, p4, p5))]
        outs.append(F.max_pool2d(outs[3], 1, stride=2))
        return outs


class TorchRPNHead(nn.Module):
    def __init__(self, channels=256, num_anchors=3):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, padding=1)
        self.cls_logits = nn.Conv2d(channels, num_anchors, 1)
        self.bbox_pred = nn.Conv2d(channels, num_anchors * 4, 1)

    def forward(self, feats):
        logits, deltas = [], []
        for f in feats:
            h = F.relu(self.conv(f))
            logits.append(self.cls_logits(h))
            deltas.append(self.bbox_pred(h))
        return logits, deltas


class TorchBoxHead(nn.Module):
    def __init__(self, num_classes=91):
        super().__init__()
        self.fc6 = nn.Linear(256 * 7 * 7, 1024)
        self.fc7 = nn.Linear(1024, 1024)
        self.cls_score = nn.Linear(1024, num_classes)
        self.bbox_pred = nn.Linear(1024, num_classes * 4)

    def forward(self, pooled):  # (R, 256, 7, 7)
        x = torch.flatten(pooled, 1)
        x = F.relu(self.fc6(x))
        x = F.relu(self.fc7(x))
        return self.cls_score(x), self.bbox_pred(x)
