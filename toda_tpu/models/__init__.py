"""Model layer: flax.linen detector modules assembled from config.

Reference: pcdet/models/__init__.py (build_network, model_fn_decorator) and
pcdet/models/detectors/detector3d_template.py (module_topology assembly).
"""

from .detectors import build_detector


def build_network(model_cfg, num_class, dataset):
    return build_detector(model_cfg=model_cfg, num_class=num_class, dataset=dataset)
