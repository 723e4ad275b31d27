"""Bare-torch reference model mirrors shared by the converter tests
(tests/test_torch_import.py) and the trained accuracy-parity harness
(tools/accuracy_parity.py). Plain imports only — this module is loaded
outside pytest too."""

import torch
import torch.nn as tnn


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
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + idt)


class TorchResNet18(tnn.Module):
    """torchvision-layout ResNet-18 trunk (pooled features, no fc) —
    mirrors `hairci/models/resnet.py` stem="imagenet".

    ``zero_init_residual=True`` zero-inits each block's LAST BN gamma like
    hairci's ``scale_init=zeros`` (torchvision exposes the same flag but
    the reference leaves it at its False default).
    """

    def __init__(self, zero_init_residual: bool = False):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        layers = []
        cin = 64
        for stage, cout in enumerate([64, 128, 256, 512]):
            blocks = []
            for b in range(2):
                stride = 2 if stage > 0 and b == 0 else 1
                blocks.append(TorchBasicBlock(cin, cout, stride))
                cin = cout
            layers.append(tnn.Sequential(*blocks))
        self.layer1, self.layer2, self.layer3, self.layer4 = layers
        # torchvision's init (resnet.py _resnet): kaiming_normal fan_out on
        # convs, BN gamma=1/beta=0 (zero_init_residual defaults to False) —
        # torch's module default (kaiming_uniform a=sqrt(5)) trains visibly
        # worse and is NOT what the reference runs
        for m in self.modules():
            if isinstance(m, tnn.Conv2d):
                tnn.init.kaiming_normal_(m.weight, mode="fan_out",
                                         nonlinearity="relu")
            elif isinstance(m, tnn.BatchNorm2d):
                tnn.init.constant_(m.weight, 1.0)
                tnn.init.constant_(m.bias, 0.0)
        if zero_init_residual:
            for m in self.modules():
                if isinstance(m, TorchBasicBlock):
                    tnn.init.constant_(m.bn2.weight, 0.0)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        return x.mean(dim=(2, 3))


class TorchBottleneck(tnn.Module):
    """torchvision v1.5 Bottleneck (stride on the 3x3) — mirrors
    `hairci/models/resnet.py:BottleneckBlock`."""

    def __init__(self, cin, width, stride=1):
        super().__init__()
        cout = width * 4
        self.conv1 = tnn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return torch.relu(out + idt)


class TorchResNet50(tnn.Module):
    """torchvision-layout ResNet-50 trunk (pooled features, no fc) —
    mirrors `hairci/models/resnet.py` Bottleneck stages [3,4,6,3]."""

    def __init__(self, zero_init_residual: bool = False):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        layers = []
        cin = 64
        for stage, (width, n) in enumerate(
                zip([64, 128, 256, 512], [3, 4, 6, 3])):
            blocks = []
            for b in range(n):
                stride = 2 if stage > 0 and b == 0 else 1
                blocks.append(TorchBottleneck(cin, width, stride))
                cin = width * 4
            layers.append(tnn.Sequential(*blocks))
        self.layer1, self.layer2, self.layer3, self.layer4 = layers
        for m in self.modules():
            if isinstance(m, tnn.Conv2d):
                tnn.init.kaiming_normal_(m.weight, mode="fan_out",
                                         nonlinearity="relu")
            elif isinstance(m, tnn.BatchNorm2d):
                tnn.init.constant_(m.weight, 1.0)
                tnn.init.constant_(m.bias, 0.0)
        if zero_init_residual:
            for m in self.modules():
                if isinstance(m, TorchBottleneck):
                    tnn.init.constant_(m.bn3.weight, 0.0)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        return x.mean(dim=(2, 3))


# SHAM2 projection dims per backbone (`main_backbone.py:571-589`,
# SimCLRProjectionHead(input, input, output)); matches
# hairci/ssl/sham.py:_PROJ_DIMS
_SHAM_DIMS = {"resnet18": (512, 128), "resnet50": (2048, 1024)}
_TRUNKS = {"resnet18": TorchResNet18, "resnet50": TorchResNet50}


class SHAMTorch(tnn.Module):
    """SHAM2-equivalent: trunk + lightly SimCLRProjectionHead dims
    (main_backbone.py:571-589) — shared by the accuracy-parity and
    step-parity harnesses."""

    def __init__(self, zero_init_residual: bool = False,
                 backbone: str = "resnet18"):
        super().__init__()
        self.backbone = _TRUNKS[backbone](
            zero_init_residual=zero_init_residual)
        d, out = _SHAM_DIMS[backbone]
        self.head = tnn.Sequential(
            tnn.Linear(d, d, bias=False), tnn.BatchNorm1d(d),
            tnn.ReLU(), tnn.Linear(d, out, bias=False),
            tnn.BatchNorm1d(out))

    def forward(self, x):
        return self.head(self.backbone(x))
