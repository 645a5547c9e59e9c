"""Metrics/observability tests (SURVEY.md §5 addition)."""

import numpy as np

import jpeglibrary_tpu as jt
from jpeglibrary_tpu.utils import metrics


def test_metrics_disabled_by_default(assets_dir):
    metrics.reset()
    assert not metrics.enabled()
    jt.decode((assets_dir / "baseline/cramps.jpg").read_bytes())
    assert metrics.snapshot()["stages"] == {}


def test_metrics_capture_stages_and_counters(assets_dir):
    metrics.reset()
    metrics.enable()
    try:
        r = jt.decode((assets_dir / "baseline/lake.jpg").read_bytes())
        np.asarray(r.to_rgb8_device(sparse=True))
        snap = metrics.snapshot()
        assert snap["stages"]["decode.parse_container"]["count"] == 1
        assert snap["stages"]["decode.entropy_scan"]["count"] == 1
        assert snap["stages"]["transform.pack_sparse"]["count"] == 1
        assert snap["counters"]["decode.images"] == 1
        assert abs(snap["counters"]["decode.megapixels"] - 1024 * 768 / 1e6) < 1e-9
        assert "decode.entropy_scan" in metrics.report()
    finally:
        metrics.enable(False)
        metrics.reset()
