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


# edges of the boxes_to_corners_3d corner template (bottom ring, top ring, pillars)
_BOX_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0),
              (4, 5), (5, 6), (6, 7), (7, 4),
              (0, 4), (1, 5), (2, 6), (3, 7)]


def scene_vis_3d(points, boxes=None, pred_boxes=None, out_path=None,
                 elev=25.0, azim=-60.0, point_size=1.2, max_points=60000):
    """3D scene rendering to a PNG (headless matplotlib; the TPU-host analog
    of the reference's open3d/mayavi viewer, ref tools/demo.py + tools/visual_utils).

    Points are colored by height; GT boxes green, predictions red. Returns the
    matplotlib Figure (caller may save/close); saves to out_path if given.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = np.asarray(points)
    if len(pts) > max_points:
        pts = pts[np.random.default_rng(0).choice(len(pts), max_points, replace=False)]
    fig = plt.figure(figsize=(12, 9), dpi=110)
    ax = fig.add_subplot(projection="3d")
    ax.set_facecolor("black")
    fig.patch.set_facecolor("black")
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=point_size, c=pts[:, 2],
               cmap="viridis", linewidths=0)

    def _draw(bxs, color):
        bxs = np.asarray(bxs)
        if bxs.size == 0:
            return
        corners = box_utils.boxes_to_corners_3d(bxs[:, :7])  # (N, 8, 3)
        for c in corners:
            for i, j in _BOX_EDGES:
                ax.plot([c[i, 0], c[j, 0]], [c[i, 1], c[j, 1]],
                        [c[i, 2], c[j, 2]], color=color, linewidth=1.0)

    if boxes is not None:
        _draw(boxes, "#00e000")
    if pred_boxes is not None:
        _draw(pred_boxes, "#ff4040")
    # equal aspect: matplotlib 3d has no set_aspect('equal'); use box limits
    lo, hi = pts[:, :3].min(axis=0), pts[:, :3].max(axis=0)
    mid, half = (lo + hi) / 2, (hi - lo).max() / 2
    ax.set_xlim(mid[0] - half, mid[0] + half)
    ax.set_ylim(mid[1] - half, mid[1] + half)
    ax.set_zlim(mid[2] - half, mid[2] + half)
    ax.view_init(elev=elev, azim=azim)
    ax.set_axis_off()
    if out_path is not None:
        fig.savefig(out_path, bbox_inches="tight", facecolor="black")
    return fig
