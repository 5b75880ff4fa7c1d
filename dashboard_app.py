"""Thin Streamlit renderer over the engine's serving layer — the
reference's streamlit_app.py with ALL query work moved into Spark
(SURVEY §3.3: the reference's dashboard is its de-facto query engine;
ours only renders a small collected dict).

Run: streamlit run dashboard_app.py -- --scored <dir>/scored
Gated behind import-try: streamlit is not part of the engine's
dependency set.
"""

from __future__ import annotations

import sys

try:
    import streamlit as st
except ImportError:  # pragma: no cover
    print("streamlit not installed; the engine-side API is")
    print("  real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.serving.dashboard_metrics")
    sys.exit(1)

from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark import (  # noqa: E402
    get_spark,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.charts import (  # noqa: E402
    bar_svg,
    histogram_svg,
    pie_svg,
)
from real_time_news_sentiment_classification_and_dashboard_using_pyspark_spark.serving import (  # noqa: E402
    REFRESH_DEFAULT_S,
    REFRESH_MAX_S,
    REFRESH_MIN_S,
    dashboard_metrics,
    raw_sample,
    refresh_cache_bucket,
    refresh_interval,
)


@st.cache_resource
def _spark():
    return get_spark("dashboard")


# cache key includes the refresh bucket: metrics recompute exactly once
# per user-chosen interval (the bucket ticks over), Streamlit reruns in
# between hit the cache — the engine-side twin of the reference's
# TTL-by-sleep contract. max_entries bounds the cache: every elapsed
# interval mints a new bucket key, so an unbounded cache grows forever
# in a long-running dashboard process.
@st.cache_data(max_entries=32)
def _metrics(scored_path: str, top_k: int, bucket: int) -> dict:
    scored = _spark().read.parquet(scored_path)
    return dashboard_metrics(scored, top_k=top_k)


def main() -> None:  # pragma: no cover - interactive
    import time

    st.set_page_config(page_title="News Sentiment", layout="wide")
    st.title("Real-Time News Sentiment")
    scored_path = st.sidebar.text_input("scored parquet dir", "streaming_output/scored")
    top_k = st.sidebar.slider("headlines", 5, 50, 20)
    # reference parity: auto-refresh toggle + 5-60 s interval slider
    # (streamlit_app.py:51-57); the same clamped value drives the metrics
    # cache bucket below and the rerun sleep at the bottom
    auto_refresh = st.sidebar.checkbox("Auto-refresh", value=True)
    interval = refresh_interval(
        st.sidebar.slider(
            "Refresh interval (seconds)",
            REFRESH_MIN_S,
            REFRESH_MAX_S,
            REFRESH_DEFAULT_S,
            step=5,
        )
    )
    m = _metrics(scored_path, top_k, refresh_cache_bucket(interval, time.time()))

    c1, c2, c3, c4 = st.columns(4)
    c1.metric("Total articles", m["total_articles"])
    c2.metric("Positive", f"{m['class_pcts']['Positive']:.1f}%")
    c3.metric("Negative", f"{m['class_pcts']['Negative']:.1f}%")
    c4.metric("Avg polarity", f"{m['avg_polarity']:.3f}" if m["avg_polarity"] is not None else "n/a")

    # pie + histogram rendered engine-side as dependency-free SVG
    # (A13 parity with the reference's matplotlib pie, work.py:333-341)
    left, right = st.columns(2)
    left.markdown(pie_svg(m["class_counts"]), unsafe_allow_html=True)
    right.markdown(histogram_svg(m["histogram"]), unsafe_allow_html=True)
    # count-ordered bar (streamlit_app.py:260-284 parity) — engine SVG,
    # not st.bar_chart, so order/labels/colors match the reference
    st.markdown(bar_svg(m["class_counts"]), unsafe_allow_html=True)
    st.subheader("Recent headlines")
    st.table(m["top_headlines"])

    # reference parity: the "Show raw data" expander
    # (streamlit_app.py:355-359) — engine serves a bounded recent slice,
    # never the whole frame
    with st.expander("Show raw data"):
        n = st.slider("rows", 50, 1000, 200)
        st.dataframe(_raw(scored_path, n))

    # reference parity: the rerun loop (streamlit_app.py:362-364) — the
    # page re-executes after the chosen interval; Spark work is bounded
    # by the cache bucket, so a fast slider never hammers the engine
    if auto_refresh:
        time.sleep(interval)
        st.rerun()


@st.cache_data(ttl=10)
def _raw(scored_path: str, n: int) -> list[dict]:
    return raw_sample(_spark().read.parquet(scored_path), n=n)


if __name__ == "__main__":
    main()
