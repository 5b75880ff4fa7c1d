"""Chart sinks (A13): sentiment distribution pie + histogram bars.

The reference renders a matplotlib pie chart and commits it as
``sentiment_distribution.png`` (work.py:333-341; streamlit pie at
streamlit_app.py:243-258). This container has no matplotlib, so the
first-class artifact here is SVG — rendered with pure deterministic
Python from the serving-layer metrics dict (O(classes)+O(bins) data,
never the corpus), testable byte-for-byte. ``save_sentiment_chart``
writes ``.svg`` natively and ``.png`` via matplotlib when it is
installed (import-gated; NotImplementedError otherwise).
"""

from __future__ import annotations

import math

CLASS_COLORS = {"Positive": "#2e7d32", "Neutral": "#9e9e9e", "Negative": "#c62828"}


def _arc_path(cx: float, cy: float, r: float, a0: float, a1: float) -> str:
    x0, y0 = cx + r * math.sin(a0), cy - r * math.cos(a0)
    x1, y1 = cx + r * math.sin(a1), cy - r * math.cos(a1)
    large = 1 if (a1 - a0) > math.pi else 0
    return (
        f"M {cx:.3f} {cy:.3f} L {x0:.3f} {y0:.3f} "
        f"A {r:.3f} {r:.3f} 0 {large} 1 {x1:.3f} {y1:.3f} Z"
    )


def pie_svg(class_counts: dict[str, int], size: int = 240) -> str:
    """Sentiment pie chart as an SVG string. Slices are drawn in the
    reference's fixed class order; a single 100% class renders as a full
    circle; an empty input renders an annotated empty frame."""
    total = sum(class_counts.values())
    cx = cy = size / 2.0
    r = size * 0.42
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{size}" height="{size}" '
        f'viewBox="0 0 {size} {size}">'
    ]
    if total == 0:
        parts.append(
            f'<circle cx="{cx}" cy="{cy}" r="{r}" fill="none" stroke="#9e9e9e"/>'
            f'<text x="{cx}" y="{cy}" text-anchor="middle" font-size="12">no data</text>'
        )
    else:
        angle = 0.0
        for label in ("Positive", "Neutral", "Negative"):
            cnt = class_counts.get(label, 0)
            if cnt <= 0:
                continue
            frac = cnt / total
            color = CLASS_COLORS[label]
            if frac >= 1.0:
                parts.append(f'<circle cx="{cx}" cy="{cy}" r="{r}" fill="{color}"/>')
                angle = 2 * math.pi
            else:
                a1 = angle + 2 * math.pi * frac
                parts.append(
                    f'<path d="{_arc_path(cx, cy, r, angle, a1)}" fill="{color}">'
                    f"<title>{label}: {cnt} ({100 * frac:.1f}%)</title></path>"
                )
                angle = a1
    parts.append("</svg>")
    return "".join(parts)


def bar_svg(
    class_counts: dict[str, int], width: int = 360, height: int = 160
) -> str:
    """Count-ordered sentiment bar chart (the reference's second chart,
    streamlit_app.py:260-284: ``counts_df.sort_values("Count",
    ascending=False)`` with the count printed outside each bar). Bars
    are ordered by count DESC, ties broken by the fixed class order;
    bar heights are proportional to count; each bar carries its class
    color and a text count label."""
    order = [
        c
        for c in sorted(
            ("Positive", "Neutral", "Negative"),
            key=lambda c: (
                -class_counts.get(c, 0),
                ("Positive", "Neutral", "Negative").index(c),
            ),
        )
    ]
    peak = max([class_counts.get(c, 0) for c in order] + [1])
    bw = width / len(order)
    label_h = 16.0  # headroom for the outside count label
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}">'
    ]
    for i, c in enumerate(order):
        cnt = class_counts.get(c, 0)
        h = (height - label_h) * cnt / peak
        x = i * bw
        parts.append(
            f'<rect x="{x + bw * 0.1:.2f}" y="{height - h:.2f}" '
            f'width="{bw * 0.8:.2f}" height="{h:.2f}" fill="{CLASS_COLORS[c]}">'
            f"<title>{c}: {cnt}</title></rect>"
            f'<text x="{x + bw / 2:.2f}" y="{height - h - 4:.2f}" '
            f'text-anchor="middle" font-size="11">{cnt}</text>'
        )
    parts.append("</svg>")
    return "".join(parts)


def histogram_svg(
    bins: list[int],
    width: int = 360,
    height: int = 120,
    lo: float = -1.0,
    hi: float = 1.0,
) -> str:
    """Fixed-bin polarity histogram as SVG bars (G6 render; the
    reference's 30-bin polarity histogram, streamlit_app.py:287-309).
    ``lo``/``hi`` are the domain the serving layer binned over
    ([-1, 1] for polarity); each bar's title carries its BIN EDGES
    [lo + i*w, lo + (i+1)*w) so the render is auditable against the
    binning rule, and the x position where 0 falls gets the
    reference's dashed 'Neutral' marker line."""
    peak = max(bins) if bins and max(bins) > 0 else 1
    n = max(len(bins), 1)
    bw = width / n
    binw = (hi - lo) / n
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}">'
    ]
    for i, cnt in enumerate(bins):
        h = height * cnt / peak
        e0, e1 = lo + i * binw, lo + (i + 1) * binw
        parts.append(
            f'<rect x="{i * bw:.2f}" y="{height - h:.2f}" width="{bw * 0.9:.2f}" '
            f'height="{h:.2f}" fill="#455a64">'
            f"<title>bin {i} [{e0:.4f}, {e1:.4f}): {cnt}</title></rect>"
        )
    if lo <= 0.0 <= hi and hi > lo:
        zx = width * (0.0 - lo) / (hi - lo)
        parts.append(
            f'<line x1="{zx:.2f}" y1="0" x2="{zx:.2f}" y2="{height}" '
            f'stroke="#c62828" stroke-dasharray="4 3">'
            f"<title>Neutral</title></line>"
        )
    parts.append("</svg>")
    return "".join(parts)


def save_sentiment_chart(metrics: dict, out_path: str) -> str:
    """Write the sentiment distribution chart. ``.svg`` is rendered
    natively; ``.png`` requires matplotlib (work.py:333-341 parity) and
    is import-gated because the engine container does not ship it."""
    if out_path.endswith(".svg"):
        with open(out_path, "w") as f:
            f.write(pie_svg(metrics["class_counts"]))
        return out_path
    if out_path.endswith(".png"):
        try:
            import matplotlib  # noqa: PLC0415

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt  # noqa: PLC0415
        except ImportError as e:
            raise NotImplementedError(
                "PNG export needs matplotlib (not in this container); "
                "use the .svg renderer instead"
            ) from e
        counts = metrics["class_counts"]
        labels = [c for c in ("Positive", "Neutral", "Negative") if counts.get(c, 0) > 0]
        fig, ax = plt.subplots()
        ax.pie(
            [counts[c] for c in labels],
            labels=labels,
            colors=[CLASS_COLORS[c] for c in labels],
            autopct="%1.1f%%",
        )
        fig.savefig(out_path)
        plt.close(fig)
        return out_path
    raise ValueError(f"unsupported chart extension: {out_path}")
