"""Test-only torch oracle: a from-scratch MVFNet-R50 built on torch.nn,
following the architecture spec of the reference
(``/root/reference/codes/models/backbones/resnet.py`` +
``modules/MVF.py`` + ``heads/tsn_clshead.py``). Used to validate both the
``.pth`` importer and the numerics of the Flax model — its state-dict key
vocabulary intentionally matches the reference checkpoints.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchMVF(nn.Module):
    def __init__(self, net, n_segment, in_channels, alpha=0.125,
                 mode='THW'):
        super().__init__()
        self.net = net
        self.n_segment = n_segment
        self.mode = mode
        cs = int(in_channels * alpha)
        self.num_shift_channel = cs
        self.split_sizes = [cs, in_channels - cs]
        self.shift_conv = nn.Conv3d(cs, cs, [3, 1, 1], padding=[1, 0, 0],
                                    groups=cs, bias=False)
        self.h_conv = nn.Conv3d(cs, cs, [1, 3, 1], padding=[0, 1, 0],
                                groups=cs, bias=False)
        self.w_conv = nn.Conv3d(cs, cs, [1, 1, 3], padding=[0, 0, 1],
                                groups=cs, bias=False)
        self.bn = nn.BatchNorm3d(cs)

    def forward(self, x):
        nt, c, h, w = x.shape
        n = nt // self.n_segment
        x = x.view(n, self.n_segment, c, h, w).transpose(1, 2)
        xs, xu = torch.split(x, self.split_sizes, dim=1)
        y = self.shift_conv(xs) + self.h_conv(xs) + self.w_conv(xs)
        y = self.bn(y)
        y = y * F.relu6(y + 3) / 6
        x = torch.cat([y, xu], dim=1)
        x = x.transpose(1, 2).contiguous().view(nt, c, h, w)
        return self.net(x)


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 mvf_segment=None, alpha=0.125):
        super().__init__()
        conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.conv1 = (TorchMVF(conv1, mvf_segment, inplanes, alpha)
                      if mvf_segment else conv1)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(out + identity)


class TorchMVFNetR50(nn.Module):
    """R50 + MVF in stages 3,4 + TSN head (eval-mode oracle)."""

    def __init__(self, num_classes=11, n_segment=4, alpha=0.125,
                 mvf_freq=(0, 0, 1, 1), depth=50):
        super().__init__()
        blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for i, nb in enumerate(blocks):
            planes = 64 * 2 ** i
            stride = 1 if i == 0 else 2
            layers = []
            for j in range(nb):
                s = stride if j == 0 else 1
                ds = None
                if j == 0 and (s != 1 or inplanes != planes * 4):
                    ds = nn.Sequential(
                        nn.Conv2d(inplanes, planes * 4, 1, stride=s,
                                  bias=False),
                        nn.BatchNorm2d(planes * 4))
                layers.append(TorchBottleneck(
                    inplanes, planes, s, ds,
                    mvf_segment=n_segment if mvf_freq[i] else None,
                    alpha=alpha))
                inplanes = planes * 4
            setattr(self, f'layer{i + 1}', nn.Sequential(*layers))
        self.new_fc = nn.Linear(2048, num_classes)
        self.n_segment = n_segment

    def features(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        return x

    def forward(self, x):
        # x: (N*T, 3, H, W) -> consensus-averaged logits (N, K)
        feat = self.features(x)
        feat = feat.mean(dim=(2, 3))
        logits = self.new_fc(feat)
        return logits.view(-1, self.n_segment, logits.shape[-1]).mean(1)


def export_reference_style_state_dict(model: TorchMVFNetR50):
    """Rename oracle keys to the reference checkpoint vocabulary:
    ``backbone.layerX.j.conv1.{net,shift_conv,...}``, ``cls_head.new_fc.*``."""
    sd = model.state_dict()
    out = {}
    for k, v in sd.items():
        if k.startswith('new_fc.'):
            out['cls_head.' + k] = v
        elif k.startswith(('conv1.', 'bn1.', 'layer')):
            # inner MVF keys already use conv1.{net,shift_conv,h_conv,w_conv,bn}
            out['backbone.' + k] = v
        else:
            out['backbone.' + k] = v
    return out


class TorchBottleneck3D(nn.Module):
    """I3D bottleneck, '3x1x1' inflate style (reference
    ``resnet_i3d.py:130-310``): conv1 (3,1,1)/p(1,0,0) when inflated,
    conv2 (1,3,3) carrying the (t,s,s) stride, conv3 1x1x1."""
    expansion = 4

    def __init__(self, inplanes, planes, spatial_stride=1,
                 temporal_stride=1, downsample=None, inflate=True):
        super().__init__()
        if inflate:
            self.conv1 = nn.Conv3d(inplanes, planes, (3, 1, 1),
                                   stride=1, padding=(1, 0, 0), bias=False)
        else:
            self.conv1 = nn.Conv3d(inplanes, planes, 1, stride=1,
                                   bias=False)
        self.bn1 = nn.BatchNorm3d(planes)
        self.conv2 = nn.Conv3d(
            planes, planes, (1, 3, 3),
            stride=(temporal_stride, spatial_stride, spatial_stride),
            padding=(0, 1, 1), bias=False)
        self.bn2 = nn.BatchNorm3d(planes)
        self.conv3 = nn.Conv3d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm3d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(out + identity)


class TorchI3DR50(nn.Module):
    """I3D ResNet-50, (5,7,7) stem, 3x1x1 inflation everywhere, pool2
    after stage 1 + I3DClsHead (reference ``resnet_i3d.py:505-745`` +
    ``heads/i3d_clshead.py``). State-dict vocabulary matches the
    reference checkpoints (``backbone.layerX.j.*``, ``cls_head.fc_cls``)."""

    def __init__(self, num_classes=7):
        super().__init__()
        self.conv1 = nn.Conv3d(3, 64, (5, 7, 7), stride=(2, 2, 2),
                               padding=(2, 3, 3), bias=False)
        self.bn1 = nn.BatchNorm3d(64)
        self.maxpool = nn.MaxPool3d((1, 3, 3), stride=(2, 2, 2),
                                    padding=(0, 1, 1))
        self.pool2 = nn.MaxPool3d((2, 1, 1), stride=(2, 1, 1))
        inplanes = 64
        for i, nb in enumerate((3, 4, 6, 3)):
            planes = 64 * 2 ** i
            sstride = 1 if i == 0 else 2
            layers = []
            for j in range(nb):
                s = sstride if j == 0 else 1
                ds = None
                if j == 0 and (s != 1 or inplanes != planes * 4):
                    ds = nn.Sequential(
                        nn.Conv3d(inplanes, planes * 4, 1,
                                  stride=(1, s, s), bias=False),
                        nn.BatchNorm3d(planes * 4))
                layers.append(TorchBottleneck3D(inplanes, planes, s, 1, ds,
                                                inflate=True))
                inplanes = planes * 4
            setattr(self, f'layer{i + 1}', nn.Sequential(*layers))
        self.fc_cls = nn.Linear(2048, num_classes)

    def features(self, x):
        # x: (N, 3, T, H, W)
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.pool2(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        return x

    def forward(self, x):
        feat = self.features(x).mean(dim=(2, 3, 4))
        return self.fc_cls(feat)


def export_i3d_state_dict(model: TorchI3DR50):
    """Rename oracle keys to the reference checkpoint vocabulary."""
    out = {}
    for k, v in model.state_dict().items():
        if k.startswith('fc_cls.'):
            out['cls_head.' + k] = v
        else:
            out['backbone.' + k] = v
    return out
