"""Every config in tools/cfgs parses through the _BASE_CONFIG_ inheritance
chain. The model dirs additionally get full build-smoke coverage in
test_model_zoo_configs.py; this pins the stage/pseudo/synthetic corpora
(which need real data to build) at the parse level."""

from pathlib import Path

import pytest

from toda_tpu.config import EDict, cfg_from_yaml_file

REPO = Path(__file__).resolve().parents[1]
ALL_CFGS = sorted(
    str(p.relative_to(REPO))
    for p in (REPO / "tools" / "cfgs").rglob("*.yaml")
    if "dataset_configs" not in p.parts
)


@pytest.mark.parametrize("rel", ALL_CFGS)
def test_config_parses(rel):
    cfg = cfg_from_yaml_file(str(REPO / rel), EDict())
    if Path(rel).name.startswith("_"):
        return  # dataset-fragment include (e.g. ssda_expt domain defs)
    assert "DATA_CONFIG" in cfg
    if "pseudo_labels" not in rel:
        assert "MODEL" in cfg and "OPTIMIZATION" in cfg
