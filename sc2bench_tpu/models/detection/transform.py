"""Detection input transform with optional compression stage.

Parity surface of `/root/reference/sc2bench/models/detection/transform.py`:
`RCNNTransformWithCompression` resizes → **compresses** (codec subprocess or
learned codec with AdaptivePad+crop) → normalizes → batches (`transform.py:
12-166`, incl. the shape-preservation assert at `:150-152`). Host-side: it
feeds the jitted detector with a fixed, bucketed canvas size so jit sees
static shapes (the TPU answer to torchvision's dynamic ImageList).
"""
from __future__ import annotations

import numpy as np
from PIL import Image

from ...transforms.misc import AdaptivePad

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class RCNNTransform:
    """Resize shorter side to `min_size` (cap longer at `max_size`),
    normalize, pad to a static canvas divisible by `size_divisible`."""

    def __init__(self, min_size=800, max_size=1333, image_mean=None,
                 image_std=None, size_divisible=32, fixed_canvas=True,
                 canvas_buckets=None):
        self.min_size = min_size
        self.max_size = max_size
        self.image_mean = np.asarray(image_mean or IMAGENET_MEAN, np.float32)
        self.image_std = np.asarray(image_std or IMAGENET_STD, np.float32)
        self.size_divisible = size_divisible
        self.fixed_canvas = fixed_canvas
        # Optional aspect-ratio canvas buckets: each bucket is one compiled
        # program shape, so recompilation is bounded by len(buckets) instead
        # of padding every image to the worst-case square. True selects the
        # landscape/portrait/square triple from (min_size, max_size).
        if canvas_buckets is True:
            canvas_buckets = self.default_buckets()
        self.canvas_buckets = [tuple(b) for b in canvas_buckets] \
            if canvas_buckets else None

    def resize(self, img: np.ndarray):
        h, w = img.shape[:2]
        scale = min(self.min_size / min(h, w), self.max_size / max(h, w))
        nh, nw = int(round(h * scale)), int(round(w * scale))
        pil = Image.fromarray(
            (np.clip(img, 0, 1) * 255).astype(np.uint8)) \
            if img.dtype != np.uint8 else Image.fromarray(img)
        resized = np.asarray(pil.resize((nw, nh), Image.BILINEAR),
                             np.float32) / 255.0
        return resized, scale

    def _round_div(self, v):
        d = self.size_divisible
        return -(-v // d) * d

    def canvas_hw(self):
        m = self._round_div(self.max_size)
        return (m, m)

    def default_buckets(self):
        """Landscape / portrait / square canvases for the reference's
        800/1333 eval geometry (torchvision resizes shorter side to 800,
        longer capped at 1333) — 3 compiled shapes total."""
        mn, mx = self._round_div(self.min_size), self._round_div(self.max_size)
        return [(mn, mx), (mx, mn), (mx, mx)]

    def _select_canvas(self, shapes):
        """Smallest bucket (by area) that fits every resized image."""
        if not self.canvas_buckets:
            return self.canvas_hw()
        need_h = max(s[0] for s in shapes)
        need_w = max(s[1] for s in shapes)
        fitting = [b for b in self.canvas_buckets
                   if b[0] >= need_h and b[1] >= need_w]
        if not fitting:
            return self.canvas_hw()
        return min(fitting, key=lambda b: b[0] * b[1])

    def __call__(self, images):
        """images: list of HWC arrays (uint8 or [0,1] float).
        Returns (batch NHWC float32, scales, original sizes)."""
        resized_all, scales, orig = [], [], []
        for img in images:
            img = np.asarray(img)
            orig.append(img.shape[:2])
            resized, scale = self.resize(img)
            resized_all.append(resized)
            scales.append(scale)
        ch, cw = self._select_canvas([r.shape[:2] for r in resized_all])
        out = []
        for resized in resized_all:
            resized = (resized - self.image_mean) / self.image_std
            canvas = np.zeros((ch, cw, 3), np.float32)
            canvas[:resized.shape[0], :resized.shape[1]] = resized
            out.append(canvas)
        return np.stack(out), np.asarray(scales, np.float32), orig


class RCNNTransformWithCompression(RCNNTransform):
    """Adds the compression stage after resize (reference
    `transform.py:56-121`): `codec` transform (PIL/BPG/VTM returning
    (img, size)) or learned codec runtime with AdaptivePad+crop-back."""

    def __init__(self, compressor=None, compression_model=None,
                 analyzer=None, adaptive_pad_factor=64, **kwargs):
        super().__init__(**kwargs)
        self.compressor = compressor
        self.compression_model = compression_model
        self.analyzer = analyzer
        self.adaptive_pad = AdaptivePad(factor=adaptive_pad_factor,
                                        returns_org_patch_size=True)

    def compress_image(self, resized: np.ndarray):
        h, w = resized.shape[:2]
        if self.compressor is not None:
            pil = Image.fromarray(
                (np.clip(resized, 0, 1) * 255).astype(np.uint8))
            out = self.compressor(pil)
            if isinstance(out, tuple):
                pil, file_size = out
                if self.analyzer is not None:
                    self.analyzer.analyze(file_size)
            else:
                pil = out
            rec = np.asarray(pil, np.float32) / 255.0
        elif self.compression_model is not None:
            import jax.numpy as jnp
            padded, (oh, ow) = self.adaptive_pad(jnp.asarray(resized))
            compressed = self.compression_model.compress(
                np.asarray(padded)[None])
            if self.analyzer is not None:
                self.analyzer.analyze(compressed)
            rec = np.asarray(
                self.compression_model.decompress(**compressed))[0]
            rec = rec[:oh, :ow]
        else:
            return resized
        assert rec.shape[:2] == (h, w), \
            f'compression changed shape {rec.shape[:2]} != {(h, w)}' \
            '  (reference assert transform.py:150-152)'
        return rec

    def __call__(self, images):
        out, scales, orig = [], [], []
        ch, cw = self.canvas_hw()
        for img in images:
            img = np.asarray(img)
            orig.append(img.shape[:2])
            resized, scale = self.resize(img)
            resized = self.compress_image(resized)
            resized = (resized - self.image_mean) / self.image_std
            canvas = np.zeros((ch, cw, 3), np.float32)
            canvas[:resized.shape[0], :resized.shape[1]] = resized
            out.append(canvas)
            scales.append(scale)
        return np.stack(out), np.asarray(scales, np.float32), orig
