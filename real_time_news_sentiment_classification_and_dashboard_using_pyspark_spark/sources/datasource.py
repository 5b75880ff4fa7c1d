"""Spark 4 Python Data Source API rendering of the article ingest (A1).

The reference polls the GNews REST API in a driver-side loop and lands
files (work.py:52-82, streaming_pipeline.py:258-308). The round-1 engine
kept that shape (sources/http.py). This module is the Spark-4-native
upgrade: the API itself becomes a first-class source —

    spark.dataSource.register(ArticlesDataSource)
    spark.read.format("articles_api").option("batches", "4").load()
    spark.readStream.format("articles_api").load()        # no files!

Batch: one InputPartition per API page, so N pages are fetched by N
EXECUTOR tasks in parallel — ingest scales with the cluster instead of
a driver loop. Streaming: offsets are page numbers; each micro-batch
reads the pages between start and end offset — no NDJSON landing zone,
no file-listing cost, exactly-once via the offset log.

The fetcher is the deterministic ``synthetic_fetcher`` (tests,
offline); a production deployment swaps the one ``_fetch_page`` call
for the real HTTP GET (requests import-gated as in sources/http.py).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

# Flat wire schema of the synthetic/GNews fetcher (sources/http.py).
ARTICLE_DDL = (
    "id string, title string, description string, content string, "
    "url string, image string, publishedAt string, lang string, fetched_at string"
)
_FIELDS = [f.split()[0] for f in ARTICLE_DDL.split(", ")]


def _fetch_page(batch_id: int, batch_size: int):
    """One API page -> list of article dicts. Swap body for a real HTTP
    call in production; everything else (partitioning, offsets) stays."""
    from .http import synthetic_fetcher

    return synthetic_fetcher(batch_id, batch_size)


class _PagePartition(InputPartition):
    def __init__(self, batch_id: int, batch_size: int):
        self.batch_id = batch_id
        self.batch_size = batch_size


class ArticlesBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_batches = int(options.get("batches", 4))
        self.batch_size = int(options.get("batch_size", 10))

    def partitions(self):
        return [_PagePartition(b, self.batch_size) for b in range(self.n_batches)]

    def read(self, partition: _PagePartition):
        for art in _fetch_page(partition.batch_id, partition.batch_size):
            yield tuple(art.get(f) for f in _FIELDS)


class ArticlesStreamReader(DataSourceStreamReader):
    """Micro-batch reader: offset = next unread page. ``latestOffset``
    reports every page the API has available (here: the configured cap;
    a live source would return its current head page), and the engine
    reads [start, end) pages per micro-batch — the reference's poll
    loop, minus the landing zone. A pages-per-trigger throttle would go
    here (the maxFilesPerTrigger analogue) by capping end - start."""

    def __init__(self, options):
        self.max_batches = int(options.get("batches", 4))
        self.batch_size = int(options.get("batch_size", 10))

    def initialOffset(self):
        return {"page": 0}

    def latestOffset(self):
        return {"page": self.max_batches}

    def partitions(self, start, end):
        return [
            _PagePartition(b, self.batch_size)
            for b in range(start["page"], end["page"])
        ]

    def read(self, partition: _PagePartition):
        for art in _fetch_page(partition.batch_id, partition.batch_size):
            yield tuple(art.get(f) for f in _FIELDS)

    def commit(self, end):
        pass

    def stop(self):
        pass


class ArticlesDataSource(DataSource):
    @classmethod
    def name(cls):
        return "articles_api"

    def schema(self):
        return ARTICLE_DDL

    def reader(self, schema):
        return ArticlesBatchReader(self.options)

    def streamReader(self, schema):
        return ArticlesStreamReader(self.options)
