"""Chart-sink tests (A13): deterministic SVG pie/histogram from the
serving metrics dict, PNG path import-gated."""

from __future__ import annotations

import math

import pytest

from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.charts import (
    histogram_svg,
    pie_svg,
    save_sentiment_chart,
)


def test_pie_has_one_slice_per_nonzero_class():
    svg = pie_svg({"Positive": 2, "Neutral": 1, "Negative": 1})
    assert svg.count("<path") == 3
    assert "Positive: 2 (50.0%)" in svg
    # deterministic: identical input -> identical bytes
    assert svg == pie_svg({"Positive": 2, "Neutral": 1, "Negative": 1})


def test_pie_single_class_is_full_circle():
    svg = pie_svg({"Positive": 5, "Neutral": 0, "Negative": 0})
    assert "<circle" in svg and "<path" not in svg


def test_pie_empty_renders_no_data_frame():
    assert "no data" in pie_svg({"Positive": 0, "Neutral": 0, "Negative": 0})


def test_pie_slice_angles_sum_to_circle():
    # the last emitted arc must end at 2*pi (floating angles accumulate)
    counts = {"Positive": 7, "Neutral": 2, "Negative": 4}
    total = sum(counts.values())
    angle = 0.0
    for c in ("Positive", "Neutral", "Negative"):
        angle += 2 * math.pi * counts[c] / total
    assert angle == pytest.approx(2 * math.pi)


def test_histogram_bars_match_bins():
    svg = histogram_svg([0, 3, 1])
    assert svg.count("<rect") == 3
    assert "bin 1: 3" in svg


def test_save_svg_and_png_gate(tmp_path):
    metrics = {"class_counts": {"Positive": 1, "Neutral": 1, "Negative": 0}}
    out = save_sentiment_chart(metrics, str(tmp_path / "dist.svg"))
    assert open(out).read().startswith("<svg")
    try:
        import matplotlib  # noqa: F401

        has_mpl = True
    except ImportError:
        has_mpl = False
    if not has_mpl:
        with pytest.raises(NotImplementedError):
            save_sentiment_chart(metrics, str(tmp_path / "dist.png"))
    else:  # pragma: no cover - container has no matplotlib
        assert save_sentiment_chart(metrics, str(tmp_path / "dist.png"))


def test_png_backend_via_stubbed_matplotlib(tmp_path, monkeypatch):
    """Exercise the real .png code path (work.py:333-341 parity) with a
    recording matplotlib stub: backend selection, pie args (zero-count
    classes dropped, reference class order + colors), savefig target,
    figure closed."""
    import sys
    import types

    calls = {}

    class _Ax:
        def pie(self, values, labels=None, colors=None, autopct=None):
            calls["pie"] = (values, labels, colors, autopct)

    class _Fig:
        def savefig(self, path):
            calls["savefig"] = path
            with open(path, "wb") as f:
                f.write(b"\x89PNG\r\n\x1a\nstub")

    mpl = types.ModuleType("matplotlib")
    mpl.use = lambda backend: calls.setdefault("backend", backend)
    plt = types.ModuleType("matplotlib.pyplot")
    plt.subplots = lambda: (_Fig(), _Ax())
    plt.close = lambda fig: calls.setdefault("closed", fig)
    mpl.pyplot = plt
    monkeypatch.setitem(sys.modules, "matplotlib", mpl)
    monkeypatch.setitem(sys.modules, "matplotlib.pyplot", plt)

    metrics = {"class_counts": {"Positive": 3, "Neutral": 0, "Negative": 1}}
    out = save_sentiment_chart(metrics, str(tmp_path / "dist.png"))

    assert calls["backend"] == "Agg"
    values, labels, colors, autopct = calls["pie"]
    assert labels == ["Positive", "Negative"]  # zero-count Neutral dropped
    assert values == [3, 1]
    assert colors == ["#2e7d32", "#c62828"]
    assert autopct == "%1.1f%%"
    assert calls["savefig"] == out
    assert "closed" in calls
    assert open(out, "rb").read().startswith(b"\x89PNG")
