"""Materialize the curated corpus — the DO-IT counterpart of the
``curation_pipeline`` stats query: apply the same quality gate →
fingerprint dedup (keep min-doc_id exemplar) → deterministic hash
sample, and WRITE the surviving documents as parquet partitioned by
language, ready to feed tokenization/packing.

Scale notes: the write is ``partitionBy("lang")`` so downstream
per-language jobs get partition pruning for free; everything upstream
is the identical keyed plan the oracle-checked stats query certifies
(one explode-agg on doc_id, one fingerprint min-agg + join, expression
sampling). ``coalesce_per_lang`` bounds output file counts for the
small-corpus case; at 100 TB drop it and let one file per task stand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .functions.text import stable_fingerprint
from .plans.text_queries import _doc_quality
from .sources.tables import table


def curated_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surviving (kept, dedup-exemplar, hash-sampled) documents with
    their text and estimated token count — the exact row set
    ``curation_pipeline`` counts as ``n_sampled``."""
    q = _doc_quality(spark, sf_dir)
    d = table(spark, sf_dir, "documents")
    fp = d.select("doc_id", "text", "source", stable_fingerprint("text").alias("fingerprint"))
    ann = q.join(fp, "doc_id")
    keepers = (
        ann.filter(F.col("kept"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_id"))
    )
    survives = F.col("kept") & (F.col("doc_id") == F.col("keep_id"))
    sampled = survives & (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 18, 15), 16, 10)
        .cast("bigint") % 2 == 0
    )
    return (
        ann.join(keepers, "fingerprint", "left")
        .filter(sampled)
        .select("doc_id", "lang", "source", "text", F.col("total").alias("est_tokens"))
    )


def write_curated_corpus(
    spark: SparkSession, sf_dir: str, out_dir: str, coalesce_per_lang: bool = True
) -> None:
    """Write the curated corpus partitioned by ``lang``."""
    df = curated_documents(spark, sf_dir)
    if coalesce_per_lang:
        df = df.repartition("lang")
    df.write.mode("overwrite").partitionBy("lang").parquet(out_dir)
