"""World-level augmentation primitives (host numpy), with record/replay params.

Reference: pcdet/datasets/augmentor/augmentor_utils.py:8-585. Every op here takes an
optional ``params`` argument: ``None`` samples fresh randomness and returns the
params used; a concrete value replays them. This single mechanism replaces the
reference's separate DataAugmentorCL replay machinery
(pcdet/datasets/augmentor/data_augmentor_cl.py) — augmentation-as-data from day one,
which is also what the stage-2 consistency loss needs to reverse transforms.
"""

import numpy as np

from ...utils import common_utils


def random_flip_along_x(gt_boxes, points, params=None):
    """Flip y coordinate with prob 0.5. Returns (boxes, points, enable_flag)."""
    enable = np.random.choice([False, True]) if params is None else bool(params)
    if enable:
        gt_boxes = gt_boxes.copy()
        points = points.copy()
        gt_boxes[:, 1] = -gt_boxes[:, 1]
        gt_boxes[:, 6] = -gt_boxes[:, 6]
        points[:, 1] = -points[:, 1]
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 8] = -gt_boxes[:, 8]  # velocity_y
    return gt_boxes, points, enable


def random_flip_along_y(gt_boxes, points, params=None):
    """Flip x coordinate with prob 0.5."""
    enable = np.random.choice([False, True]) if params is None else bool(params)
    if enable:
        gt_boxes = gt_boxes.copy()
        points = points.copy()
        gt_boxes[:, 0] = -gt_boxes[:, 0]
        gt_boxes[:, 6] = -(gt_boxes[:, 6] + np.pi)
        points[:, 0] = -points[:, 0]
        if gt_boxes.shape[1] > 7:
            gt_boxes[:, 7] = -gt_boxes[:, 7]  # velocity_x
    return gt_boxes, points, enable


def global_rotation(gt_boxes, points, rot_range, params=None):
    noise = (
        np.random.uniform(rot_range[0], rot_range[1]) if params is None else float(params)
    )
    points = common_utils.rotate_points_along_z(points[None], np.array([noise]))[0]
    gt_boxes = gt_boxes.copy()
    gt_boxes[:, 0:3] = common_utils.rotate_points_along_z(
        gt_boxes[None, :, 0:3], np.array([noise])
    )[0]
    gt_boxes[:, 6] += noise
    if gt_boxes.shape[1] > 7:
        vel = np.concatenate(
            [gt_boxes[:, 7:9], np.zeros((gt_boxes.shape[0], 1), dtype=gt_boxes.dtype)], axis=1
        )
        gt_boxes[:, 7:9] = common_utils.rotate_points_along_z(vel[None], np.array([noise]))[
            0, :, 0:2
        ]
    return gt_boxes, points, noise


def global_scaling(gt_boxes, points, scale_range, params=None):
    if scale_range[1] - scale_range[0] < 1e-3 and params is None:
        return gt_boxes, points, 1.0
    scale = (
        np.random.uniform(scale_range[0], scale_range[1]) if params is None else float(params)
    )
    points = points.copy()
    gt_boxes = gt_boxes.copy()
    points[:, :3] *= scale
    gt_boxes[:, :6] *= scale
    if gt_boxes.shape[1] > 7:
        gt_boxes[:, 7:9] *= scale
    return gt_boxes, points, scale


def global_translation(gt_boxes, points, noise_std, params=None):
    if params is None:
        noise = np.random.normal(0, np.asarray(noise_std), 3)
    else:
        noise = np.asarray(params, dtype=np.float64)
    points = points.copy()
    gt_boxes = gt_boxes.copy()
    points[:, :3] += noise
    gt_boxes[:, :3] += noise
    return gt_boxes, points, noise.tolist()


def random_local_rotation(gt_boxes, points, rot_range, params=None):
    """Rotate each object (box + its points) independently about its own center.

    Reference: augmentor_utils random_local_rotation. params: (M,) angles.
    """
    from ...utils import box_utils

    m = len(gt_boxes)
    if m == 0:
        return gt_boxes, points, []
    angles = (
        np.random.uniform(rot_range[0], rot_range[1], m) if params is None
        else np.asarray(params)
    )
    gt_boxes = gt_boxes.copy()
    points = points.copy()
    member = _members_with_margin(points, gt_boxes[:, :7])
    for j in range(m):
        sel = member[j]
        c, s = np.cos(angles[j]), np.sin(angles[j])
        rel = points[sel, :2] - gt_boxes[j, :2]
        points[sel, 0] = rel[:, 0] * c - rel[:, 1] * s + gt_boxes[j, 0]
        points[sel, 1] = rel[:, 0] * s + rel[:, 1] * c + gt_boxes[j, 1]
        gt_boxes[j, 6] += angles[j]
    return gt_boxes, points, angles.tolist()


def random_local_scaling(gt_boxes, points, scale_range, params=None):
    """Scale each object independently about its center (points + box dims)."""
    from ...utils import box_utils

    m = len(gt_boxes)
    if m == 0:
        return gt_boxes, points, []
    scales = (
        np.random.uniform(scale_range[0], scale_range[1], m) if params is None
        else np.asarray(params)
    )
    gt_boxes = gt_boxes.copy()
    points = points.copy()
    member = _members_with_margin(points, gt_boxes[:, :7])
    for j in range(m):
        sel = member[j]
        points[sel, :3] = (points[sel, :3] - gt_boxes[j, :3]) * scales[j] + gt_boxes[j, :3]
        gt_boxes[j, 3:6] *= scales[j]
    return gt_boxes, points, scales.tolist()


def random_world_frustum_dropout(gt_boxes, points, intensity_range=(0.2, 0.7),
                                 directions=("top",), params=None):
    """Global slab dropout off the cloud's extremes, one slab per configured
    direction (z-axis for top/bottom, y-axis for left/right), applied
    sequentially — later slabs see the already-thinned cloud.

    Reference: augmentor_utils.global_frustum_dropout_{top,bottom,left,right}
    (:244-311), driven per DIRECTION entry by data_augmentor.py:167-184.
    params: [intensity per direction]. Returns (boxes, points, used, box_keep)
    with box_keep indexed over the input boxes.
    """
    if params is None:
        intensities = np.random.uniform(*intensity_range, size=len(directions))
    else:
        intensities = np.asarray(params, dtype=np.float64)
    box_keep = np.ones(len(gt_boxes), bool)
    cur_boxes = gt_boxes
    for d, inten in zip(directions, intensities):
        if len(points) == 0:
            break
        axis = 2 if d in ("top", "bottom") else 1
        lo, hi = points[:, axis].min(), points[:, axis].max()
        if d in ("top", "left"):
            thr = hi - inten * (hi - lo)
            pkeep = points[:, axis] < thr
            bkeep = cur_boxes[:, axis] < thr
        else:  # bottom / right
            thr = lo + inten * (hi - lo)
            pkeep = points[:, axis] > thr
            bkeep = cur_boxes[:, axis] > thr
        points = points[pkeep]
        box_keep[np.flatnonzero(box_keep)[~bkeep]] = False
        cur_boxes = cur_boxes[bkeep]
    return cur_boxes, points, intensities.tolist(), box_keep


def random_local_frustum_dropout(gt_boxes, points, intensity_range=(0.2, 0.7),
                                 directions=("top",), params=None):
    """Per-box slab dropout: for every gt box, drop the points inside it that
    fall in a slab of random thickness off one face; every configured
    direction is applied in turn (fresh per-box intensities each).

    Reference: augmentor_utils.local_frustum_dropout_{top,bottom,left,right}
    (:394-473) — global-axis slabs (z for top/bottom, y for left/right; the
    reference ignores heading for left/right, preserved here), one random
    intensity per box per direction (data_augmentor.py:186-202).
    params: [[intensity per box] per direction].
    """
    m = len(gt_boxes)
    if params is None:
        per_dir = [np.random.uniform(*intensity_range, size=m) for _ in directions]
    else:
        per_dir = [np.asarray(p, dtype=np.float64) for p in params]
    if m == 0:
        return gt_boxes, points, [p.tolist() for p in per_dir], np.ones(len(points), bool)

    from ...utils import box_utils

    keep = np.ones(len(points), bool)
    z, dz = gt_boxes[:, 2], gt_boxes[:, 5]
    y, dy = gt_boxes[:, 1], gt_boxes[:, 4]
    member = _members_with_margin(points, gt_boxes[:, :7])  # (m, n)
    for direction, intensities in zip(directions, per_dir):
        if direction == "top":
            drop = member & (points[None, :, 2] >= (z + dz / 2 - intensities * dz)[:, None])
        elif direction == "bottom":
            drop = member & (points[None, :, 2] <= (z - dz / 2 + intensities * dz)[:, None])
        elif direction == "left":
            drop = member & (points[None, :, 1] >= (y + dy / 2 - intensities * dy)[:, None])
        else:  # right
            drop = member & (points[None, :, 1] <= (y - dy / 2 + intensities * dy)[:, None])
        keep &= ~drop.any(axis=0)
    return gt_boxes, points[keep], [p.tolist() for p in per_dir], keep


def reverse_boxes_transform(boxes, aug_params):
    """Undo recorded world augmentations on predicted boxes (for the stage-2
    consistency loss — reference pcdet/models/__init__.py reverse_transform).

    aug_params: list of (name, params) in the order applied; we invert in reverse.
    boxes: (N, 7+) numpy or jnp-convertible.
    """
    boxes = np.array(boxes, copy=True)
    for name, p in reversed(aug_params):
        if name == "random_world_flip_x" and p:
            boxes[:, 1] = -boxes[:, 1]
            boxes[:, 6] = -boxes[:, 6]
        elif name == "random_world_flip_y" and p:
            boxes[:, 0] = -boxes[:, 0]
            boxes[:, 6] = -(boxes[:, 6] + np.pi)
        elif name == "random_world_rotation":
            boxes[:, 0:3] = common_utils.rotate_points_along_z(
                boxes[None, :, 0:3], np.array([-p])
            )[0]
            boxes[:, 6] -= p
        elif name == "random_world_scaling":
            boxes[:, :6] /= p
        elif name == "random_world_translation":
            boxes[:, :3] -= np.asarray(p)
    return boxes


# ---------------------------------------------------------------------------
# local translations + pyramid-partition augmentations
# Reference: pcdet/datasets/augmentor/augmentor_utils.py:178-242 (local
# translations), :474-531 (pyramid helpers), :535-585 (dropout/sparsify),
# :585-660 (swap). Host-side numpy, record/replayable where parameterizable.
# ---------------------------------------------------------------------------


def get_points_in_box(points, box):
    """Mask of points inside one 7-dof box (local-frame extent check).

    Matches the reference's get_points_in_box (augmentor_utils.py:474-492)
    including its 0.1 m x/y MARGIN (z has no margin)."""
    mask = _members_with_margin(points, box[None, :7])[0]
    return points[mask], mask


def _members_with_margin(points, boxes, margin=1e-1):
    """(P, 3+) x (M, 7) -> (M, P) membership with the reference augmentor's
    x/y margin (augmentor_utils.py:480 MARGIN = 1e-1)."""
    points = np.asarray(points)[:, :3]
    boxes = np.asarray(boxes)
    if len(boxes) == 0 or len(points) == 0:
        return np.zeros((len(boxes), len(points)), dtype=bool)
    shifted = points[None, :, :] - boxes[:, None, 0:3]
    cosa = np.cos(-boxes[:, 6])[:, None]
    sina = np.sin(-boxes[:, 6])[:, None]
    local_x = shifted[..., 0] * cosa - shifted[..., 1] * sina
    local_y = shifted[..., 0] * sina + shifted[..., 1] * cosa
    return (
        (np.abs(local_x) <= boxes[:, None, 3] / 2.0 + margin)
        & (np.abs(local_y) <= boxes[:, None, 4] / 2.0 + margin)
        & (np.abs(shifted[..., 2]) <= boxes[:, None, 5] / 2.0)
    )


def _random_local_translation(gt_boxes, points, offset_range, axis, params=None):
    n = gt_boxes.shape[0]
    offsets = params if params is not None else np.random.uniform(
        offset_range[0], offset_range[1], size=n
    )
    for idx in range(n):
        if gt_boxes[idx, 3:6].max() <= 0:
            continue
        _, mask = get_points_in_box(points, gt_boxes[idx])
        points[mask, axis] += offsets[idx]
        gt_boxes[idx, axis] += offsets[idx]
    return gt_boxes, points, offsets


def random_local_translation_along_x(gt_boxes, points, offset_range, params=None):
    return _random_local_translation(gt_boxes, points, offset_range, 0, params)


def random_local_translation_along_y(gt_boxes, points, offset_range, params=None):
    return _random_local_translation(gt_boxes, points, offset_range, 1, params)


def random_local_translation_along_z(gt_boxes, points, offset_range, params=None):
    return _random_local_translation(gt_boxes, points, offset_range, 2, params)


def get_pyramids(boxes):
    """(N, 7+) boxes -> (N, 6, 15) face pyramids: apex (box center) + the 4
    corners of each of the six faces, flattened. Face/corner ordering follows
    the reference's pyramid_orders over boxes_to_corners_3d."""
    from ...utils.box_utils import boxes_to_corners_3d

    orders = np.array([
        [0, 1, 5, 4], [4, 5, 6, 7], [7, 6, 2, 3],
        [3, 2, 1, 0], [1, 2, 6, 5], [0, 4, 7, 3],
    ])
    corners = boxes_to_corners_3d(boxes[:, :7]).reshape(-1, 8, 3)
    pyr = np.empty((boxes.shape[0], 6, 15), dtype=boxes.dtype)
    for f, order in enumerate(orders):
        pyr[:, f, 0:3] = boxes[:, 0:3]
        for k, ci in enumerate(order):
            pyr[:, f, 3 + 3 * k : 6 + 3 * k] = corners[:, ci]
    return pyr


def _points_in_one_pyramid(points, pyr):
    """Half-space test against the 5 faces of one (15,) pyramid. The hull of
    apex + base quad; normals oriented toward the centroid."""
    verts = pyr.reshape(5, 3)
    apex, base = verts[0], verts[1:]
    centroid = verts.mean(axis=0)
    faces = [
        (base[0], base[1], base[2]),  # base plane (quad is planar per face)
        (apex, base[0], base[1]),
        (apex, base[1], base[2]),
        (apex, base[2], base[3]),
        (apex, base[3], base[0]),
    ]
    inside = np.ones(points.shape[0], dtype=bool)
    for a, b, c in faces:
        nrm = np.cross(b - a, c - a)
        if np.dot(nrm, centroid - a) < 0:
            nrm = -nrm
        inside &= (points[:, :3] - a) @ nrm >= -1e-9
    return inside


def points_in_pyramids_mask(points, pyramids):
    """(M, 3+C) x (K, 15)-or-(K, 5, 3) -> (M, K) bool."""
    pyramids = pyramids.reshape(-1, 15)
    flags = np.zeros((points.shape[0], pyramids.shape[0]), dtype=bool)
    for i in range(pyramids.shape[0]):
        flags[:, i] = _points_in_one_pyramid(points, pyramids[i])
    return flags


def local_pyramid_dropout(gt_boxes, points, dropout_prob, pyramids=None):
    """Drop all points of one random face-pyramid per selected box."""
    if pyramids is None:
        pyramids = get_pyramids(gt_boxes).reshape(-1, 6, 5, 3)
    n = pyramids.shape[0]
    if n == 0:
        return gt_boxes, points, pyramids
    face = np.random.randint(0, 6, n)
    sel = np.random.uniform(0, 1, n) <= dropout_prob
    if sel.any():
        drop = pyramids[sel, face[sel]]
        hit = points_in_pyramids_mask(points, drop)
        points = points[~hit.any(-1)]
    return gt_boxes, points, pyramids[~sel]


def local_pyramid_sparsify(gt_boxes, points, prob, max_num_pts, pyramids=None):
    """Subsample one random face-pyramid per selected box down to max_num_pts."""
    if pyramids is None:
        pyramids = get_pyramids(gt_boxes).reshape(-1, 6, 5, 3)
    n = pyramids.shape[0]
    if n == 0:
        return gt_boxes, points, pyramids
    face = np.random.randint(0, 6, n)
    sel = np.random.uniform(0, 1, n) <= prob
    if sel.any():
        cand = pyramids[sel, face[sel]]
        masks = points_in_pyramids_mask(points, cand)
        dense = masks.sum(0) > max_num_pts
        masks = masks[:, dense]
        if masks.shape[1] > 0:
            keep = ~masks.any(-1)
            kept_parts = [points[keep]]
            for i in range(masks.shape[1]):
                inpts = points[masks[:, i]]
                idx = np.random.choice(inpts.shape[0], size=max_num_pts, replace=False)
                kept_parts.append(inpts[idx])
            points = np.concatenate(kept_parts, axis=0)
    return gt_boxes, points, pyramids[~sel]


def _pyramid_ratio_coords(points, pyr):
    """(alpha, beta, gamma) coordinates of points in a (15,) pyramid frame:
    base-parallelogram coefficients + apex-axis fraction."""
    apex, b0, b1, _, b3 = pyr.reshape(5, 3)
    scenter = pyr.reshape(5, 3)[1:].mean(axis=0)
    v0, v1, v2 = b1 - b0, b3 - b0, apex - scenter
    alpha = ((points[:, :3] - b0) * v0).sum(-1) / max((v0 ** 2).sum(), 1e-9)
    beta = ((points[:, :3] - b0) * v1).sum(-1) / max((v1 ** 2).sum(), 1e-9)
    gamma = ((points[:, :3] - scenter) * v2).sum(-1) / max((v2 ** 2).sum(), 1e-9)
    return alpha, beta, gamma


def _pyramid_points_from_ratio(ratios, pyr):
    apex, b0, b1, _, b3 = pyr.reshape(5, 3)
    scenter = pyr.reshape(5, 3)[1:].mean(axis=0)
    v0, v1, v2 = b1 - b0, b3 - b0, apex - scenter
    alpha, beta, gamma = ratios
    return alpha[:, None] * v0 + beta[:, None] * v1 + b0 + gamma[:, None] * v2


def local_pyramid_swap(gt_boxes, points, prob, max_num_pts, pyramids=None):
    """Exchange the points of one face-pyramid per selected box with the
    same-face pyramid of another (random) box, via ratio coordinates;
    intensities rescaled to the destination pyramid's range."""
    if pyramids is None:
        pyramids = get_pyramids(gt_boxes).reshape(-1, 6, 5, 3)
    n = pyramids.shape[0]
    if n == 0:
        return gt_boxes, points
    sel_box = np.random.uniform(0, 1, n) <= prob
    if not sel_box.any():
        return gt_boxes, points
    masks_all = points_in_pyramids_mask(points, pyramids)  # (M, n*6)
    counts = masks_all.sum(0).reshape(n, 6)
    rich = counts > max_num_pts

    pairs = []  # (box_i, face, partner_box)
    for i in np.nonzero(sel_box)[0]:
        faces = np.nonzero(rich[i])[0]
        if faces.size == 0:
            continue
        f = np.random.choice(faces)
        partners = np.nonzero(rich[:, f] & (np.arange(n) != i))[0]
        if partners.size == 0:
            continue
        pairs.append((i, f, np.random.choice(partners)))
    if not pairs:
        return gt_boxes, points

    swap_masks = []
    swap_specs = []
    for i, f, j in pairs:
        swap_masks.append(masks_all[:, i * 6 + f])
        swap_masks.append(masks_all[:, j * 6 + f])
        swap_specs.append((pyramids[i, f].reshape(15), pyramids[j, f].reshape(15)))
    any_swapped = np.stack(swap_masks, axis=1).any(-1)
    remain = points[~any_swapped]

    moved = []
    for k, (pyr_a, pyr_b) in enumerate(swap_specs):
        pts_a = points[swap_masks[2 * k]]
        pts_b = points[swap_masks[2 * k + 1]]
        for src, dst_pyr, dst_ref in ((pts_b, pyr_a, pts_a), (pts_a, pyr_b, pts_b)):
            if src.shape[0] == 0:
                continue
            src_pyr = pyr_b if dst_pyr is pyr_a else pyr_a
            new_xyz = _pyramid_points_from_ratio(
                _pyramid_ratio_coords(src, src_pyr), dst_pyr
            )
            out = src.copy()
            out[:, :3] = new_xyz
            if src.shape[1] > 3 and dst_ref.shape[0] > 0:
                lo, hi = dst_ref[:, -1].min(), dst_ref[:, -1].max()
                slo, shi = src[:, -1].min(), src[:, -1].max()
                ratio = (src[:, -1] - slo) / max(shi - slo, 1e-6)
                out[:, -1] = ratio * (hi - lo) + lo
            moved.append(out)
    if moved:
        points = np.concatenate([remain] + moved, axis=0)
    return gt_boxes, points
