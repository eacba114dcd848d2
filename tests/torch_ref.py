"""Minimal PyTorch mirrors of the reference architectures, used ONLY as
golden oracles in tests (torchvision is not installed in this image).

State_dict key naming intentionally matches torchvision / the reference
(`conv1`, `bn1`, `layerS.B.*`, `fc`, `features.8`, `top.{0,2,4}`,
`classifier.{1,4,6}`) so the production converters in
video_dqn_tpu.models.torch_convert are exercised against the real naming
contract.
"""

import torch
import torch.nn as nn


class TorchBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idt)


class TorchResNet18(nn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        widths = [64, 128, 256, 512]
        cin = 64
        for s, w in enumerate(widths):
            blocks = [
                TorchBasicBlock(cin, w, stride=(2 if s > 0 else 1)),
                TorchBasicBlock(w, w),
            ]
            setattr(self, f"layer{s+1}", nn.Sequential(*blocks))
            cin = w
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(512, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for s in range(1, 5):
            x = getattr(self, f"layer{s}")(x)
        return self.fc(torch.flatten(self.avgpool(x), 1))


class TorchHabitatDQN(nn.Module):
    """Mirror of the reference Q-net head wiring
    (HabitatDQNMultiAction: features Sequential over resnet children +
    extra conv; top MLP)."""

    def __init__(self, action_dim, num_classes=5, extra_capacity=False, panorama=True):
        super().__init__()
        self.resnet = TorchResNet18()
        self.extra_capacity = extra_capacity
        self.num_classes = num_classes
        self.action_dim = action_dim
        self.num_frames = 4 if panorama else 1
        children = list(self.resnet.children())
        if extra_capacity:
            self.features = nn.Sequential(
                *children[:-2], nn.Conv2d(512, 64, 3), nn.ReLU(), nn.Flatten()
            )
            feat_dim = None  # computed lazily by caller via probe
            self.top = None

    def finish(self, image_size):
        """Build `top` after probing the per-frame feature dim."""
        children = list(self.resnet.children())
        if self.extra_capacity:
            with torch.no_grad():
                d = self.features(torch.zeros(1, 3, image_size, image_size)).shape[1]
            self.top = nn.Sequential(
                nn.Linear(d * self.num_frames, 512), nn.ReLU(),
                nn.Linear(512, 256), nn.ReLU(),
                nn.Linear(256, self.action_dim * self.num_classes),
            )
        else:
            self.features = nn.Sequential(*children[:-1])
            self.top = nn.Linear(512 * self.num_frames,
                                 self.action_dim * self.num_classes)
        return self

    def forward(self, inp):
        if self.num_frames == 1 and inp.dim() == 4:
            inp = inp.unsqueeze(1)
        feats = [
            torch.flatten(self.features(inp[:, i]), 1)
            for i in range(self.num_frames)
        ]
        out = self.top(torch.cat(feats, 1))
        return out.view(-1, self.num_classes, self.action_dim)


class TorchInverseModel(nn.Module):
    def __init__(self):
        super().__init__()
        base = TorchResNet18()
        self.resnet18 = nn.Sequential(*list(base.children())[:-2])
        self.conv1 = nn.Conv2d(1024, 256, 1)
        self.conv2 = nn.Conv2d(256, 256, 3)
        self.conv3 = nn.Conv2d(256, 64, 3)
        self.fc1 = None  # finish() sets after probe
        self.fc2 = nn.Linear(128, 3)
        self.fc_accuracy = nn.Linear(3, 3)

    def finish(self, image_size):
        with torch.no_grad():
            t = self.resnet18(torch.zeros(1, 3, image_size, image_size))
            x = torch.relu(self.conv3(torch.relu(self.conv2(torch.relu(
                self.conv1(torch.cat([t, t], 1)))))))
        self.fc1 = nn.Linear(x.numel(), 128)
        return self

    def forward(self, k, k1):
        a, b = self.resnet18(k), self.resnet18(k1)
        x = torch.cat([a, b], 1)
        x = torch.relu(self.conv1(x))
        x = torch.relu(self.conv2(x))
        x = torch.relu(self.conv3(x))
        x = torch.flatten(x, 1)
        x = torch.relu(self.fc1(x))
        x = self.fc2(x)
        return torch.softmax(x, 1), self.fc_accuracy(x)


class TorchAlexNet(nn.Module):
    def __init__(self, num_classes=365):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv2d(3, 64, 11, stride=4, padding=2), nn.ReLU(),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(),
            nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(),
            nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(),
            nn.MaxPool2d(3, 2),
        )
        self.classifier = nn.Sequential(
            nn.Dropout(), nn.Linear(256 * 6 * 6, 4096), nn.ReLU(),
            nn.Dropout(), nn.Linear(4096, 4096), nn.ReLU(),
            nn.Linear(4096, num_classes),
        )

    def forward(self, x):
        return self.classifier(torch.flatten(self.features(x), 1))
