"""HTTP REST ingest (A1) + the batch-file generator (the reference's
streaming test harness, streaming_pipeline.py:258-308).

Spark has no HTTP source; the idiomatic shape (SURVEY §2.A1) is a small
driver-side ingest task that lands NDJSON batch files for the streaming
file source to pick up. The fetcher is injectable: production uses
``gnews_fetcher`` (requests, gated behind import-try since live HTTP is
never in a test path), tests use ``synthetic_fetcher`` — a deterministic
article generator mirroring FIXTURES.md §1 (duplicate titles, null/empty
descriptions, malformed timestamps) so every downstream edge case gets
exercised.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterable
from datetime import datetime, timedelta, timezone
from pathlib import Path

Article = dict
Fetcher = Callable[[int], list[Article]]

_POS = ["fast", "spark", "big", "stream", "merge", "value"]
_NEG = ["slow", "dup", "small", "filter", "scan"]
_NEU = ["the", "a", "data", "table", "row", "column"]


def synthetic_fetcher(batch_id: int, batch_size: int = 10) -> list[Article]:
    """Deterministic stand-in for the GNews API (work.py:52-82): same
    schema, fully reproducible from (batch_id, row index). ~10% duplicate
    titles (dedup key), ~10% empty descriptions (B4 filter food)."""
    base = datetime(2025, 11, 21, 20, 0, 0, tzinfo=timezone.utc)
    out = []
    for i in range(batch_size):
        k = batch_id * batch_size + i
        words = (
            [_POS[k % len(_POS)]] * (k % 3)
            + [_NEG[k % len(_NEG)]] * ((k + 1) % 3)
            + [_NEU[k % len(_NEU)]] * 2
        )
        desc = "" if k % 10 == 7 else " ".join(words)
        out.append(
            {
                "id": f"{k:08x}",
                "title": f"headline {k % max(1, int(batch_size * 0.9))}",
                "description": desc,
                "content": f"{desc} ... [{len(desc)} chars]",
                "url": f"https://example.com/a/{k}",
                "image": f"https://example.com/i/{k}.jpg",
                "publishedAt": (base + timedelta(minutes=k)).strftime("%Y-%m-%dT%H:%M:%SZ"),
                "lang": "en",
                "fetched_at": (base + timedelta(minutes=k, seconds=30)).isoformat(),
            }
        )
    return out


def gnews_fetcher(api_key: str, query: str = "technology", max_articles: int = 50) -> Fetcher:
    """Live GNews fetcher (reference work.py:52-82: 10 s timeout, stamps
    fetched_at). Returns a Fetcher; never used in tests or benchmarks."""
    try:
        import requests  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("requests not available in this environment") from e

    def fetch(batch_id: int) -> list[Article]:  # pragma: no cover - network
        url = (
            "https://gnews.io/api/v4/search"
            f"?q={query}&lang=en&max={max_articles}&apikey={api_key}"
        )
        resp = requests.get(url, timeout=10)
        resp.raise_for_status()
        articles = resp.json().get("articles", [])
        now = datetime.now().isoformat()
        for a in articles:
            a["fetched_at"] = now
        return articles

    return fetch


def generate_batches(
    input_dir: str,
    n_batches: int = 3,
    interval_seconds: float = 0.0,
    fetcher: Fetcher = synthetic_fetcher,
    start_index: int = 0,
) -> list[str]:
    """Drop NDJSON batch files into the watched directory — the
    generator loop of streaming_pipeline.py:258-308, with injectable
    fetch and zero-sleep mode for tests. ``start_index`` offsets the
    batch ids (and therefore filenames): Spark's file source tracks seen
    files BY NAME, so a caller landing batches incrementally must never
    reuse a filename or the stream silently drops the batch."""
    out = Path(input_dir)
    out.mkdir(parents=True, exist_ok=True)
    written = []
    for b in range(start_index, start_index + n_batches):
        path = out / f"batch_{b}_{1700000000 + b}.json"
        with open(path, "w") as f:
            for article in fetcher(b):
                f.write(json.dumps(article) + "\n")
        written.append(str(path))
        if interval_seconds and b < start_index + n_batches - 1:
            time.sleep(interval_seconds)
    return written


def run_ingest_loop(
    input_dir: str,
    fetcher: Fetcher,
    interval_seconds: float = 300.0,
    max_iterations: int | None = None,
) -> Iterable[str]:  # pragma: no cover - long-running driver loop
    """Continuous polling ingest (work.py:357-389): fetch -> land file ->
    sleep. Yields each written file path; cap with max_iterations."""
    b = 0
    while max_iterations is None or b < max_iterations:
        # start_index threads the loop counter into the filename — each
        # iteration lands a NEW file (batch_b_...) instead of rewriting
        # batch_0, which the file source would ignore as already-seen
        yield from generate_batches(input_dir, n_batches=1, fetcher=fetcher, start_index=b)
        b += 1
        time.sleep(interval_seconds)
