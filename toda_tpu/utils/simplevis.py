"""BEV debug rasterizer (pure numpy, no cv2/numba).

Reference: pcdet/utils/simplevis.py (309 LoC: numba BEV raster + cv2 box draw).
Produces an (H, W, 3) uint8 image: point density in gray, boxes as outlines.
Used for visual spot checks in tests/notebooks and by tools/demo.py.
"""

import numpy as np

from . import box_utils


def point_cloud_bev(points, pc_range, resolution=0.1):
    x0, y0, _, x1, y1, _ = pc_range
    w = int(round((x1 - x0) / resolution))
    h = int(round((y1 - y0) / resolution))
    xi = ((points[:, 0] - x0) / resolution).astype(int)
    yi = ((points[:, 1] - y0) / resolution).astype(int)
    ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    img = np.zeros((h, w), np.float32)
    np.add.at(img, (yi[ok], xi[ok]), 1.0)
    img = np.clip(img / max(img.max(), 1.0) * 4.0, 0, 1)
    return (img * 255).astype(np.uint8)


def _draw_line(img, p0, p1, color):
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1)) + 1
    xs = np.linspace(p0[0], p1[0], n).astype(int)
    ys = np.linspace(p0[1], p1[1], n).astype(int)
    ok = (xs >= 0) & (xs < img.shape[1]) & (ys >= 0) & (ys < img.shape[0])
    img[ys[ok], xs[ok]] = color


def draw_boxes_bev(img, boxes, pc_range, resolution=0.1, color=(0, 255, 0)):
    if len(boxes) == 0:
        return img
    corners = box_utils.corners_bev(np.asarray(boxes))  # (N, 4, 2)
    x0, y0 = pc_range[0], pc_range[1]
    px = ((corners[..., 0] - x0) / resolution).astype(int)
    py = ((corners[..., 1] - y0) / resolution).astype(int)
    for i in range(len(boxes)):
        for k in range(4):
            _draw_line(img, (px[i, k], py[i, k]), (px[i, (k + 1) % 4], py[i, (k + 1) % 4]), color)
    return img


def nuscene_vis(points, boxes=None, pc_range=(-50, -50, -5, 50, 50, 3), resolution=0.1,
                pred_boxes=None):
    """One-call scene visualization (reference simplevis.nuscene_vis)."""
    gray = point_cloud_bev(np.asarray(points), pc_range, resolution)
    img = np.stack([gray] * 3, axis=-1)
    if boxes is not None and len(boxes):
        img = draw_boxes_bev(img, boxes, pc_range, resolution, color=(0, 255, 0))
    if pred_boxes is not None and len(pred_boxes):
        img = draw_boxes_bev(img, pred_boxes, pc_range, resolution, color=(255, 64, 64))
    return img
