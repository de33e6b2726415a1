#!/usr/bin/env python
"""Measured reference baseline: the sc2-benchmark deploy loop in plain torch
on this host's CPU.

Replicates the reference's batch-1 eval hot loop (SURVEY.md §3.2,
`/root/reference/sc2bench/models/layer.py:496-521`,
`sc2bench/models/backbone.py:225-254`) with the exact same architecture as
our flagship (Entropic Student ResNet-50, factorized-prior bottleneck,
24-channel latent):

    torch conv+GDN1 encoder -> round(y - medians) -> C++ single-stream rANS
    encode -> decode -> dequantize -> torch conv+IGDN decoder -> ResNet-50
    layer2-4 tail -> logits

The entropy tables come from the torch golden oracle
(`sc2bench_tpu/utils/torch_golden.py` — CompressAI's exact table-build
algorithm) and the byte coder is the in-repo C++ rANS (CompressAI bitstream
format, single-stream mode = CompressAI-class). Serial per-image loop, as
the reference's `-no_dp_eval` batch-1 protocol requires.

Writes the measured images/sec into BASELINE.json under `measured`
(consumed by bench.py as the vs_baseline denominator) and prints a JSON
line with a stage breakdown.

    python script/bench_reference.py [--n_iter 50]
"""
import argparse
import json
import platform
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402
import torch  # noqa: E402
import torch.nn as nn  # noqa: E402

from sc2bench_tpu.ops.rans.coder import RansCoder  # noqa: E402
from sc2bench_tpu.utils.torch_golden import GoldenEntropyBottleneck  # noqa: E402


class GDN1(nn.Module):
    """GDN1 (NCHW): y = x / (beta + gamma |x|); inverse multiplies."""

    def __init__(self, channels, inverse=False):
        super().__init__()
        self.inverse = inverse
        self.beta = nn.Parameter(torch.ones(channels))
        self.gamma = nn.Parameter(0.1 * torch.eye(channels))

    def forward(self, x):
        c = x.shape[1]
        norm = nn.functional.conv2d(torch.abs(x),
                                    self.gamma.view(c, c, 1, 1), self.beta)
        return x * norm if self.inverse else x / norm


def fp_encoder(bch=24):
    return nn.Sequential(
        nn.Conv2d(3, bch * 4, 5, 2, 2, bias=False), GDN1(bch * 4),
        nn.Conv2d(bch * 4, bch * 2, 5, 2, 2, bias=False), GDN1(bch * 2),
        nn.Conv2d(bch * 2, bch, 2, 1, 0, bias=False))


def fp_decoder(bch=24, target=256):
    return nn.Sequential(
        nn.Conv2d(bch, target * 2, 2, 1, 1, bias=False),
        GDN1(target * 2, inverse=True),
        nn.Conv2d(target * 2, target, 2, 1, 0, bias=False),
        GDN1(target, inverse=True),
        nn.Conv2d(target, target, 2, 1, 1, bias=False))


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        out = planes * self.expansion
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, out, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or inplanes != out:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, out, 1, stride, bias=False),
                nn.BatchNorm2d(out))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


def resnet50_tail(num_classes=1000):
    def stage(inplanes, planes, blocks, stride):
        layers = [Bottleneck(inplanes, planes, stride)]
        layers += [Bottleneck(planes * 4, planes) for _ in range(blocks - 1)]
        return nn.Sequential(*layers)

    return nn.Sequential(
        stage(256, 128, 4, 2), stage(512, 256, 6, 2), stage(1024, 512, 3, 2),
        nn.AdaptiveAvgPool2d(1), nn.Flatten(), nn.Linear(2048, num_classes))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n_iter', type=int, default=50)
    ap.add_argument('--no_write', action='store_true',
                    help='do not update BASELINE.json')
    args = ap.parse_args()
    torch.manual_seed(0)

    bch = 24
    encoder, decoder, tail = fp_encoder(bch), fp_decoder(bch), resnet50_tail()
    eb = GoldenEntropyBottleneck(bch)
    for m in (encoder, decoder, tail, eb):
        m.eval()

    with torch.no_grad():
        # spread the quantiles a little so tables have realistic support
        eb.quantiles[:, 0, 0] -= 2.0
        eb.quantiles[:, 0, 2] += 2.0
    cdf, cdf_len, offset, medians = eb.update()
    coder = RansCoder(cdf, cdf_len, offset)
    med_t = torch.from_numpy(medians).view(1, bch, 1, 1)

    rng = np.random.default_rng(0)
    images = [torch.from_numpy(
        rng.normal(0, 1, (1, 3, 224, 224)).astype(np.float32))
        for _ in range(8)]

    stage_t = {'encode': 0.0, 'rans': 0.0, 'decode_tail': 0.0}

    @torch.no_grad()
    def one(img):
        t0 = time.perf_counter()
        y = encoder(img)
        sym = torch.round(y - med_t).to(torch.int32).numpy()
        t1 = time.perf_counter()
        c, h, w = sym.shape[1:]
        flat = np.transpose(sym[0], (0, 1, 2)).reshape(c, -1).ravel()
        indexes = np.repeat(np.arange(c, dtype=np.int32), h * w)
        bits = coder.encode_with_indexes(flat, indexes)
        out = coder.decode_with_indexes(bits, indexes)
        t2 = time.perf_counter()
        y_hat = torch.from_numpy(
            out.reshape(1, c, h, w).astype(np.float32)) + med_t
        logits = tail(decoder(y_hat))
        t3 = time.perf_counter()
        stage_t['encode'] += t1 - t0
        stage_t['rans'] += t2 - t1
        stage_t['decode_tail'] += t3 - t2
        return logits, len(bits)

    one(images[0])  # warmup
    for k in stage_t:
        stage_t[k] = 0.0
    t0 = time.perf_counter()
    for i in range(args.n_iter):
        logits, nbytes = one(images[i % len(images)])
    elapsed = time.perf_counter() - t0
    ips = args.n_iter / elapsed

    result = {
        'metric': 'reference_torch_cpu_deploy_ips_batch1',
        'value': round(ips, 2),
        'unit': 'images/sec',
        'host': platform.processor() or platform.machine(),
        'torch_threads': torch.get_num_threads(),
        'bytes_per_image': nbytes,
        'stage_breakdown_ms_per_image': {
            k: round(v / args.n_iter * 1000, 2) for k, v in stage_t.items()},
    }
    print(json.dumps(result))

    if not args.no_write:
        path = REPO / 'BASELINE.json'
        data = json.loads(path.read_text())
        data.setdefault('measured', {})[
            'torch_cpu_deploy_ips_batch1'] = result
        path.write_text(json.dumps(data, indent=2))


if __name__ == '__main__':
    main()
