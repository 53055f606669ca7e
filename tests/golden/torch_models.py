"""Torch-CPU golden models mirroring the flax architectures layer-for-layer
(same module names, same padding), used as the parity oracle (SURVEY.md §4
tier 1). The reference repo was unreadable, so the oracle is this independent
torch implementation of the canonical SSD/RetinaNet family architectures.

Weight flow in tests: torch state_dict --utils/torch_convert--> flax params,
then both sides run the same input and must agree (box-IoU 0.99 / score 1e-3).
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def _round_ch(c, mult):
    return max(8, int(c * mult))


class TorchL2Norm(nn.Module):
    def __init__(self, channels, init_scale=20.0):
        super().__init__()
        self.scale = nn.Parameter(torch.full((channels,), init_scale))

    def forward(self, x):  # x: (B, C, H, W)
        norm = x.pow(2).sum(dim=1, keepdim=True).add(1e-10).sqrt()
        return x / norm * self.scale.view(1, -1, 1, 1)


class TorchVGG16(nn.Module):
    def __init__(self, width_mult=1.0):
        super().__init__()
        w = lambda c: _round_ch(c, width_mult)
        cv = lambda i, o, **kw: nn.Conv2d(i, o, 3, padding=1, **kw)
        self.conv1_1 = cv(3, w(64))
        self.conv1_2 = cv(w(64), w(64))
        self.conv2_1 = cv(w(64), w(128))
        self.conv2_2 = cv(w(128), w(128))
        self.conv3_1 = cv(w(128), w(256))
        self.conv3_2 = cv(w(256), w(256))
        self.conv3_3 = cv(w(256), w(256))
        self.conv4_1 = cv(w(256), w(512))
        self.conv4_2 = cv(w(512), w(512))
        self.conv4_3 = cv(w(512), w(512))
        self.conv5_1 = cv(w(512), w(512))
        self.conv5_2 = cv(w(512), w(512))
        self.conv5_3 = cv(w(512), w(512))
        self.conv6 = nn.Conv2d(w(512), w(1024), 3, padding=6, dilation=6)
        self.conv7 = nn.Conv2d(w(1024), w(1024), 1)

    def forward(self, x):
        pool = lambda x: F.max_pool2d(x, 2, 2)
        x = F.relu(self.conv1_2(F.relu(self.conv1_1(x))))
        x = pool(x)
        x = F.relu(self.conv2_2(F.relu(self.conv2_1(x))))
        x = pool(x)
        x = F.relu(self.conv3_3(F.relu(self.conv3_2(F.relu(self.conv3_1(x))))))
        x = F.max_pool2d(x, 2, 2, ceil_mode=True)  # pool3: 75 -> 38 at 300px
        x = F.relu(self.conv4_3(F.relu(self.conv4_2(F.relu(self.conv4_1(x))))))
        conv4_3 = x
        x = pool(x)
        x = F.relu(self.conv5_3(F.relu(self.conv5_2(F.relu(self.conv5_1(x))))))
        x = F.max_pool2d(x, 3, 1, 1)  # pool5
        x = F.relu(self.conv6(x))
        x = F.relu(self.conv7(x))
        return conv4_3, x


def _ssd_extra_plan(image_size):
    if image_size == 512:
        return [("conv8", 256, 512, 2, 1, 3), ("conv9", 128, 256, 2, 1, 3),
                ("conv10", 128, 256, 2, 1, 3), ("conv11", 128, 256, 2, 1, 3),
                ("conv12", 128, 256, 1, 1, 4)]
    return [("conv8", 256, 512, 2, 1, 3), ("conv9", 128, 256, 2, 1, 3),
            ("conv10", 128, 256, 1, 0, 3), ("conv11", 128, 256, 1, 0, 3)]


class TorchSSDExtras(nn.Module):
    def __init__(self, in_ch, image_size, width_mult=1.0):
        super().__init__()
        w = lambda c: _round_ch(c, width_mult)
        self.plan = _ssd_extra_plan(image_size)
        cur = in_ch
        for name, c1, c2, stride, pad, kernel in self.plan:
            setattr(self, f"{name}_1", nn.Conv2d(cur, w(c1), 1))
            setattr(self, f"{name}_2",
                    nn.Conv2d(w(c1), w(c2), kernel, stride=stride, padding=pad))
            cur = w(c2)

    def forward(self, x):
        feats = []
        for name, *_ in self.plan:
            x = F.relu(getattr(self, f"{name}_1")(x))
            x = F.relu(getattr(self, f"{name}_2")(x))
            feats.append(x)
        return feats


class TorchSSD(nn.Module):
    """Mirror of models/ssd.py::SSD. num_classes = foreground classes."""

    def __init__(self, image_size=300, num_classes=80, width_mult=1.0,
                 aspect_ratios=None):
        super().__init__()
        w = lambda c: _round_ch(c, width_mult)
        self.image_size = image_size
        self.num_classes = num_classes
        self.vgg = TorchVGG16(width_mult)
        self.l2norm = TorchL2Norm(w(512))
        self.extras = TorchSSDExtras(w(1024), image_size, width_mult)
        if aspect_ratios is None:
            n_levels = 7 if image_size == 512 else 6
            aspect_ratios = [(1.0, 2.0, 0.5)] * n_levels
        feat_ch = [w(512), w(1024)] + [w(c2) for _, _, c2, _, _, _ in
                                       _ssd_extra_plan(image_size)]
        c_cls = num_classes + 1
        self.num_priors = [len(r) + 1 for r in aspect_ratios]
        for i, (ch, a) in enumerate(zip(feat_ch, self.num_priors)):
            setattr(self, f"loc_{i}", nn.Conv2d(ch, a * 4, 3, padding=1))
            setattr(self, f"cls_{i}", nn.Conv2d(ch, a * c_cls, 3, padding=1))

    def forward(self, x):  # x: (B, 3, H, W) normalized
        conv4_3, conv7 = self.vgg(x)
        feats = [self.l2norm(conv4_3), conv7] + self.extras(conv7)
        cls_out, box_out = [], []
        c_cls = self.num_classes + 1
        for i, (f, a) in enumerate(zip(feats, self.num_priors)):
            loc = getattr(self, f"loc_{i}")(f)
            cls = getattr(self, f"cls_{i}")(f)
            b = loc.shape[0]
            box_out.append(loc.permute(0, 2, 3, 1).reshape(b, -1, 4))
            cls_out.append(cls.permute(0, 2, 3, 1).reshape(b, -1, c_cls))
        return torch.cat(cls_out, 1), torch.cat(box_out, 1)


# ---------------------------------------------------------------------------
# RetinaNet golden
# ---------------------------------------------------------------------------


class TorchBottleneck(nn.Module):
    def __init__(self, in_ch, channels, stride=1):
        super().__init__()
        out_ch = channels * 4
        self.conv1 = nn.Conv2d(in_ch, channels, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(channels)
        self.conv2 = nn.Conv2d(channels, channels, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(channels)
        self.conv3 = nn.Conv2d(channels, out_ch, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch)
        self.has_down = in_ch != out_ch or stride != 1
        if self.has_down:
            self.downsample = nn.Conv2d(in_ch, out_ch, 1, stride=stride,
                                        bias=False)
            self.downsample_bn = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        r = x
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if self.has_down:
            r = self.downsample_bn(self.downsample(x))
        return F.relu(y + r)


STAGE_BLOCKS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


class TorchResNet(nn.Module):
    def __init__(self, variant="resnet50", width_mult=1.0):
        super().__init__()
        w = lambda c: max(8, int(c * width_mult))
        blocks = STAGE_BLOCKS[variant]
        self.conv1 = nn.Conv2d(3, w(64), 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(w(64))
        widths = (w(64), w(128), w(256), w(512))
        self.block_names = []
        in_ch = w(64)
        for stage, (n, ch) in enumerate(zip(blocks, widths)):
            for blk in range(n):
                stride = 2 if (blk == 0 and stage > 0) else 1
                name = f"layer{stage + 1}_{blk}"
                setattr(self, name, TorchBottleneck(in_ch, ch, stride))
                in_ch = ch * 4
                self.block_names.append((stage, name))
        self.out_chs = [widths[i] * 4 for i in range(4)]

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        taps = {}
        for stage, name in self.block_names:
            x = getattr(self, name)(x)
            taps[stage] = x
        return taps[1], taps[2], taps[3]


class TorchFPN(nn.Module):
    def __init__(self, c3, c4, c5, out_ch=256):
        super().__init__()
        self.lateral_3 = nn.Conv2d(c3, out_ch, 1)
        self.lateral_4 = nn.Conv2d(c4, out_ch, 1)
        self.lateral_5 = nn.Conv2d(c5, out_ch, 1)
        self.smooth_3 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.smooth_4 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.smooth_5 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.p6 = nn.Conv2d(c5, out_ch, 3, stride=2, padding=1)
        self.p7 = nn.Conv2d(out_ch, out_ch, 3, stride=2, padding=1)

    def forward(self, c3, c4, c5):
        p5 = self.lateral_5(c5)
        p4 = self.lateral_4(c4) + F.interpolate(p5, size=c4.shape[-2:],
                                                mode="nearest")
        p3 = self.lateral_3(c3) + F.interpolate(p4, size=c3.shape[-2:],
                                                mode="nearest")
        p3, p4, p5 = self.smooth_3(p3), self.smooth_4(p4), self.smooth_5(p5)
        p6 = self.p6(c5)
        p7 = self.p7(F.relu(p6))
        return [p3, p4, p5, p6, p7]


class TorchRetinaHead(nn.Module):
    def __init__(self, in_ch, num_outputs, num_anchors, depth=4, channels=256,
                 final_bias=0.0):
        super().__init__()
        self.num_outputs = num_outputs
        cur = in_ch
        self.depth = depth
        for i in range(depth):
            setattr(self, f"conv_{i}", nn.Conv2d(cur, channels, 3, padding=1))
            cur = channels
        self.predict = nn.Conv2d(cur, num_anchors * num_outputs, 3, padding=1)
        nn.init.constant_(self.predict.bias, final_bias)

    def forward(self, x):
        for i in range(self.depth):
            x = F.relu(getattr(self, f"conv_{i}")(x))
        x = self.predict(x)
        b = x.shape[0]
        return x.permute(0, 2, 3, 1).reshape(b, -1, self.num_outputs)


class TorchRetinaNet(nn.Module):
    def __init__(self, variant="resnet50", num_classes=80, width_mult=1.0,
                 fpn_channels=256, head_depth=4, num_anchors=9):
        super().__init__()
        self.backbone = TorchResNet(variant, width_mult)
        c3, c4, c5 = self.backbone.out_chs[1:]
        self.fpn = TorchFPN(c3, c4, c5, fpn_channels)
        prior = 0.01
        self.cls_head = TorchRetinaHead(
            fpn_channels, num_classes, num_anchors, head_depth, fpn_channels,
            final_bias=-math.log((1 - prior) / prior))
        self.box_head = TorchRetinaHead(
            fpn_channels, 4, num_anchors, head_depth, fpn_channels)

    def forward(self, x):
        c3, c4, c5 = self.backbone(x)
        pyramid = self.fpn(c3, c4, c5)
        cls = torch.cat([self.cls_head(p) for p in pyramid], 1)
        box = torch.cat([self.box_head(p) for p in pyramid], 1)
        return cls, box
