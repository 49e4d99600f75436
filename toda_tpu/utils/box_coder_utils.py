"""Anchor/point box coders in JAX.

Reference surface: pcdet/utils/box_coder_utils.py:5-222 (ResidualCoder,
PreviousResidualDecoder, PointResidualCoder).
"""

import jax.numpy as jnp
import numpy as np


class ResidualCoder:
    """Anchor-relative residual encoding (SECOND/PointPillars standard).

    Reference: box_coder_utils.ResidualCoder (encode_torch/decode_torch).
    """

    def __init__(self, code_size=7, encode_angle_by_sincos=False):
        self.code_size = code_size
        self.encode_angle_by_sincos = encode_angle_by_sincos
        if encode_angle_by_sincos:
            self.code_size += 1

    def encode(self, boxes, anchors):
        """boxes, anchors: (..., 7+) -> (..., code_size)."""
        dxa = jnp.clip(anchors[..., 3], 1e-5, None)
        dya = jnp.clip(anchors[..., 4], 1e-5, None)
        dza = jnp.clip(anchors[..., 5], 1e-5, None)
        dxg = jnp.clip(boxes[..., 3], 1e-5, None)
        dyg = jnp.clip(boxes[..., 4], 1e-5, None)
        dzg = jnp.clip(boxes[..., 5], 1e-5, None)
        diag = jnp.sqrt(dxa**2 + dya**2)
        xt = (boxes[..., 0] - anchors[..., 0]) / diag
        yt = (boxes[..., 1] - anchors[..., 1]) / diag
        zt = (boxes[..., 2] - anchors[..., 2]) / dza
        dxt = jnp.log(dxg / dxa)
        dyt = jnp.log(dyg / dya)
        dzt = jnp.log(dzg / dza)
        if self.encode_angle_by_sincos:
            rt = [
                jnp.cos(boxes[..., 6]) - jnp.cos(anchors[..., 6]),
                jnp.sin(boxes[..., 6]) - jnp.sin(anchors[..., 6]),
            ]
        else:
            rt = [boxes[..., 6] - anchors[..., 6]]
        # extra channels (e.g. velocity) encode as residuals vs the anchor,
        # matching reference encode_torch's `cts = [g - a ...]`
        cts = [boxes[..., i] - anchors[..., i] for i in range(7, boxes.shape[-1])]
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt, *rt, *cts], axis=-1)

    def decode(self, encodings, anchors):
        """(..., code_size) + (..., 7+) anchors -> (..., 7+) boxes."""
        dxa, dya, dza = anchors[..., 3], anchors[..., 4], anchors[..., 5]
        diag = jnp.sqrt(dxa**2 + dya**2)
        xg = encodings[..., 0] * diag + anchors[..., 0]
        yg = encodings[..., 1] * diag + anchors[..., 1]
        zg = encodings[..., 2] * dza + anchors[..., 2]
        dxg = jnp.exp(encodings[..., 3]) * dxa
        dyg = jnp.exp(encodings[..., 4]) * dya
        dzg = jnp.exp(encodings[..., 5]) * dza
        if self.encode_angle_by_sincos:
            rg_cos = encodings[..., 6] + jnp.cos(anchors[..., 6])
            rg_sin = encodings[..., 7] + jnp.sin(anchors[..., 6])
            rg = jnp.arctan2(rg_sin, rg_cos)
            rest = 8
        else:
            rg = encodings[..., 6] + anchors[..., 6]
            rest = 7
        cgs = [encodings[..., i] for i in range(rest, encodings.shape[-1])]
        cas = [anchors[..., i] for i in range(7, anchors.shape[-1])]
        extra = [c + a for c, a in zip(cgs, cas)] if cas else cgs
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *extra], axis=-1)


class PreviousResidualDecoder:
    """Legacy decode used by some checkpoints (reference: box_coder_utils.py:104-132)."""

    def __init__(self, code_size=7):
        self.code_size = code_size

    @staticmethod
    def decode(box_encodings, anchors):
        # legacy encoding order is (x, y, z, w, l, h, r): w pairs with dy (width),
        # l with dx (length) — reference decode_torch uses exp(lt)*dxa / exp(wt)*dya
        dxa, dya, dza = anchors[..., 3], anchors[..., 4], anchors[..., 5]
        diag = jnp.sqrt(dxa**2 + dya**2)
        xg = box_encodings[..., 0] * diag + anchors[..., 0]
        yg = box_encodings[..., 1] * diag + anchors[..., 1]
        zg = box_encodings[..., 2] * dza + anchors[..., 2]
        dxg = jnp.exp(box_encodings[..., 4]) * dxa
        dyg = jnp.exp(box_encodings[..., 3]) * dya
        dzg = jnp.exp(box_encodings[..., 5]) * dza
        rg = box_encodings[..., 6] + anchors[..., 6]
        # extra channels (e.g. velocity) are residuals off the anchor, same as
        # ResidualCoder.decode (reference box_coder_utils.py:129: cgs = [t + a])
        cgs = [
            box_encodings[..., i] + anchors[..., i]
            for i in range(7, box_encodings.shape[-1])
        ]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *cgs], axis=-1)


class PointResidualCoder:
    """Point-to-box residual coding for point heads (PointRCNN / 3DSSD style).

    Reference: box_coder_utils.PointResidualCoder (use_mean_size variant).
    """

    def __init__(self, code_size=8, use_mean_size=True, mean_size=None):
        self.code_size = code_size
        self.use_mean_size = use_mean_size
        if use_mean_size:
            self.mean_size = jnp.asarray(np.asarray(mean_size, dtype=np.float32))

    def encode(self, gt_boxes, points, gt_classes=None):
        """gt_boxes (N, 7+), points (N, 3), gt_classes (N,) 1-indexed."""
        dxg = jnp.clip(gt_boxes[..., 3], 1e-5, None)
        dyg = jnp.clip(gt_boxes[..., 4], 1e-5, None)
        dzg = jnp.clip(gt_boxes[..., 5], 1e-5, None)
        xg, yg, zg, rg = (
            gt_boxes[..., 0], gt_boxes[..., 1], gt_boxes[..., 2], gt_boxes[..., 6]
        )
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
        if self.use_mean_size:
            pt_size = self.mean_size[jnp.clip(gt_classes - 1, 0, None)]
            dxa, dya, dza = pt_size[..., 0], pt_size[..., 1], pt_size[..., 2]
            diag = jnp.sqrt(dxa**2 + dya**2)
            xt = (xg - xa) / diag
            yt = (yg - ya) / diag
            zt = (zg - za) / dza
            dxt = jnp.log(dxg / dxa)
            dyt = jnp.log(dyg / dya)
            dzt = jnp.log(dzg / dza)
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt, dyt, dzt = jnp.log(dxg), jnp.log(dyg), jnp.log(dzg)
        cts = [gt_boxes[..., i] for i in range(7, gt_boxes.shape[-1])]
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt, jnp.cos(rg), jnp.sin(rg), *cts], axis=-1)

    def decode(self, box_encodings, points, pred_classes=None):
        xt, yt, zt = box_encodings[..., 0], box_encodings[..., 1], box_encodings[..., 2]
        dxt, dyt, dzt = box_encodings[..., 3], box_encodings[..., 4], box_encodings[..., 5]
        cost, sint = box_encodings[..., 6], box_encodings[..., 7]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
        if self.use_mean_size:
            pt_size = self.mean_size[jnp.clip(pred_classes - 1, 0, None)]
            dxa, dya, dza = pt_size[..., 0], pt_size[..., 1], pt_size[..., 2]
            diag = jnp.sqrt(dxa**2 + dya**2)
            xg = xt * diag + xa
            yg = yt * diag + ya
            zg = zt * dza + za
            dxg = jnp.exp(dxt) * dxa
            dyg = jnp.exp(dyt) * dya
            dzg = jnp.exp(dzt) * dza
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg, dyg, dzg = jnp.exp(dxt), jnp.exp(dyt), jnp.exp(dzt)
        rg = jnp.arctan2(sint, cost)
        cgs = [box_encodings[..., i] for i in range(8, box_encodings.shape[-1])]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *cgs], axis=-1)
