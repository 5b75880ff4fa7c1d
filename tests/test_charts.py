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
    # titles now carry the bin edges (r10 parity upgrade): 3 bins over
    # [-1, 1] -> bin 1 spans [-1/3, 1/3)
    assert "bin 1 [-0.3333, 0.3333): 3" in svg


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


# ---------------------------------------------------------------------------
# Dashboard parity (r9 verdict #6): the reference's chart semantics
# (streamlit_app.py:243-309 — pie with percent labels, count-ordered
# bar, 30-bin polarity histogram with a neutral marker) asserted
# against oracle-computed values from a fixed metrics dict, using the
# reference README's 28/15/7 (56/30/14%) example run as the fixture.

README_COUNTS = {"Positive": 28, "Neutral": 15, "Negative": 7}


def test_pie_readme_percentages_match_oracle():
    svg = pie_svg(README_COUNTS)
    # percent+label tooltips carry the exact README percentages
    assert "Positive: 28 (56.0%)" in svg
    assert "Neutral: 15 (30.0%)" in svg
    assert "Negative: 7 (14.0%)" in svg
    # each slice's arc fraction equals count/total: recompute the arc
    # endpoints the renderer must have used and assert they appear
    total = sum(README_COUNTS.values())
    angle = 0.0
    for c in ("Positive", "Neutral", "Negative"):
        a1 = angle + 2 * math.pi * README_COUNTS[c] / total
        size, r = 240, 240 * 0.42
        x1 = size / 2 + r * math.sin(a1)
        y1 = size / 2 - r * math.cos(a1)
        assert f"{x1:.3f} {y1:.3f}" in svg, f"slice boundary for {c} wrong"
        angle = a1


def test_bar_is_count_ordered_desc_with_labels():
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.charts import (
        bar_svg,
    )

    svg = bar_svg(README_COUNTS)
    # order: Positive(28), Neutral(15), Negative(7) — count DESC
    assert (
        svg.index("Positive: 28")
        < svg.index("Neutral: 15")
        < svg.index("Negative: 7")
    )
    # a different count ordering reorders the bars (reference
    # sort_values("Count", ascending=False))
    svg2 = bar_svg({"Positive": 3, "Neutral": 9, "Negative": 5})
    assert (
        svg2.index("Neutral: 9")
        < svg2.index("Negative: 5")
        < svg2.index("Positive: 3")
    )
    # bar heights proportional to counts (peak fills the bar area)
    import re

    hs = re.findall(r'height="([0-9.]+)" fill="[^"]+"><title>(\w+): (\d+)', svg)
    by_class = {name: (float(h), int(cnt)) for h, name, cnt in hs}
    hp, cp = by_class["Positive"]
    for name, (h, cnt) in by_class.items():
        assert abs(h - hp * cnt / cp) < 0.02, f"{name} height not proportional"
    # outside count labels present
    for c, n in README_COUNTS.items():
        assert f">{n}</text>" in svg


def test_histogram_bin_edges_and_counts_match_oracle(spark):
    """Engine 30-bin histogram (serving.dashboard_metrics) vs a pure-
    Python binning oracle over the same polarity values, and the SVG
    render must carry the correct [lo, hi) bin edges and the neutral
    marker at x=0."""
    from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.serving import (
        dashboard_metrics,
    )

    from pyspark.sql import functions as F

    # 50 deterministic polarity values spanning [-1, 1], README class mix
    pol = [round(-1.0 + 2.0 * i / 49, 6) for i in range(50)]
    rows = spark.range(50).select(
        F.concat(F.lit("id"), F.col("id")).alias("id"),
        # dedup_latest keys on title — keep them distinct
        F.concat(F.lit("t"), F.col("id")).alias("title"),
        F.lit("2025-11-21T20:06:38Z").alias("publishedAt"),
        F.lit("2025-11-22 13:52:00").cast("timestamp").alias("fetched_at"),
        F.element_at(
            F.array(*[F.lit(v) for v in pol]), (F.col("id") + 1).cast("int")
        ).alias("polarity"),
    )
    rows = rows.withColumn(
        "sentiment",
        F.when(F.col("polarity") > 0.1, "Positive")
        .when(F.col("polarity") < -0.1, "Negative")
        .otherwise("Neutral"),
    )
    m = dashboard_metrics(rows, top_k=5, nbins=30)
    # oracle: fixed-width binning over [-1, 1], top edge closed
    nbins, width = 30, 2.0 / 30
    oracle = [0] * nbins
    for v in pol:
        oracle[min(int((v + 1.0) // width), nbins - 1)] += 1
    assert m["histogram"] == oracle
    svg = histogram_svg(m["histogram"])
    # every bin's edges rendered [lo + i*w, lo + (i+1)*w)
    for i in (0, 14, 29):
        e0, e1 = -1.0 + i * width, -1.0 + (i + 1) * width
        assert f"bin {i} [{e0:.4f}, {e1:.4f}): {oracle[i]}" in svg
    # the reference's dashed neutral line sits at x=0 (svg midpoint)
    assert 'x1="180.00"' in svg and "Neutral" in svg
