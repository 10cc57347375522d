"""Machine-readable scaling-record closure (r9 VERDICT #5).

Every registered heavy-family query (dedup / sim / emb / multimodal /
graph prefixes) must resolve to at least one machine-readable probe
row: a leg in SCALING_registry.json (written by
tools/scale_registry_probe.py at sf0.01 vs sf0.1) with at least two
scales. A new heavy query therefore fails here until it is probed —
the same closure the bench coverage pass enforces for timings.

The specialized SCALING_<family>.json files (ann, dedup, wave73, ...)
are additionally shape-checked when present: {leg: {scale: seconds}}.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path):
    with open(path) as f:
        return json.load(f)


def test_every_heavy_query_has_probe_row():
    from tools.scale_registry_probe import heavy_queries

    path = os.path.join(REPO, "SCALING_registry.json")
    assert os.path.exists(path), (
        "SCALING_registry.json missing - run tools/scale_registry_probe.py"
    )
    data = _load(path)
    missing = [n for n in heavy_queries() if n not in data]
    assert not missing, (
        f"heavy queries without a scaling probe row: {missing} - "
        "run tools/scale_registry_probe.py " + " ".join(missing)
    )
    thin = [n for n in heavy_queries() if len(data.get(n, {})) < 2]
    assert not thin, f"heavy queries probed at fewer than 2 scales: {thin}"


def test_scaling_json_shape():
    for path in glob.glob(os.path.join(REPO, "SCALING_*.json")):
        data = _load(path)
        assert isinstance(data, dict) and data, path
        for leg, scales in data.items():
            assert isinstance(scales, dict) and scales, (path, leg)
            for scale, sec in scales.items():
                assert isinstance(sec, (int, float)), (path, leg, scale)
