"""MLlib sentiment model — the 'real' scorer path from BASELINE.json's
north star (Structured Streaming + MLlib for sentiment).

Three scorers, one interface (SURVEY §7.3):
1. expression lexicon (functions.sentiment.polarity_expr) — zero-shuffle,
   oracle-checkable, the parity scorer;
2. broadcast-join lexicon (functions.sentiment.score_text) — same
   numbers, demonstrates the join rendering;
3. THIS: an MLlib pipeline (RegexTokenizer -> HashingTF -> IDF ->
   LogisticRegression) trained on lexicon-labeled documents — entirely
   JVM-side at inference, usable inside Structured Streaming because a
   fitted PipelineModel.transform is a pure narrow map.

Training is weak supervision: the deterministic lexicon classifier
labels the corpus, the model learns to generalize beyond exact lexicon
hits. At 100 TB you train on a sample (collect to MLlib's distributed
fit is already parallel) and broadcast the fitted model everywhere —
inference cost is a hash + dot product per row.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.sentiment import score_text_expr
from ..sources.tables import table

LABELS = ["Neutral", "Positive", "Negative"]  # index = label id
_LABEL_TO_ID = {s: float(i) for i, s in enumerate(LABELS)}


def label_expr(sentiment_col: str) -> F.Column:
    m = F.create_map(
        *[x for s, i in _LABEL_TO_ID.items() for x in (F.lit(s), F.lit(i))]
    )
    return F.element_at(m, F.col(sentiment_col))


def build_pipeline(num_features: int = 1 << 12) -> Pipeline:
    tokenizer = RegexTokenizer(
        inputCol="text", outputCol="ml_tokens", pattern="\\s+", toLowercase=True
    )
    tf = HashingTF(inputCol="ml_tokens", outputCol="tf", numFeatures=num_features)
    idf = IDF(inputCol="tf", outputCol="features")
    lr = LogisticRegression(
        maxIter=40,
        regParam=0.001,
        family="multinomial",
        labelCol="label",
        featuresCol="features",
    )
    return Pipeline(stages=[tokenizer, tf, idf, lr])


def train_sentiment_model(train: DataFrame, text_col: str = "text") -> PipelineModel:
    """Fit the pipeline on (text, sentiment)-labeled rows. Deterministic:
    LR here uses L-BFGS over a fixed dataset — no sampling."""
    labeled = train.withColumn("label", label_expr("sentiment")).select(
        F.col(text_col).alias("text"), "label"
    )
    return build_pipeline().fit(labeled)


_MODEL_MEMO: dict[str, PipelineModel] = {}


def _model_path(sf_dir: str) -> str:
    import os

    from ..sources.tables import data_fingerprint

    # Key = corpus label + CONTENT fingerprint of the training table:
    # path-independent (any checkout of the repo resolves the committed
    # artifact — the old md5-of-abspath key only resolved on the machine
    # that wrote it) and staleness-proof (a regenerated fixture corpus
    # changes the fingerprint, forcing a refit instead of silently
    # loading a model trained on the old bytes).
    label = os.path.basename(os.path.abspath(sf_dir).rstrip(os.sep))
    fp = data_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    # default registry dir is TRACKED (repo-root/models, committed):
    # the fitted artifact is deterministic (fixed fixture corpus, L-BFGS
    # over a fixed dataset), so shipping it means a fresh checkout pays
    # model LOAD (~1s) instead of a full refit (~9s) on first query —
    # exactly the train-once contract a model registry gives you at
    # scale. The old default (cwd/spark-warehouse) was gitignored, so
    # every fresh checkout silently retrained. .gitignore whitelists the
    # expected fixture tags only, so stray per-corpus dirs written by
    # ephemeral test fixtures never show up in git status.
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    base = os.environ.get(
        "SPARK_GRAFT_MODEL_DIR", os.path.join(repo_root, "models")
    )
    return os.path.join(base, f"sentiment_lr_{label}_{fp}")


def train_on_documents(
    spark: SparkSession, sf_dir: str, persist: bool = True
) -> PipelineModel:
    """Weak supervision: lexicon-label the documents table, fit.

    Train-once semantics — the production contract for a model in a
    query path: the fitted PipelineModel is memoized per corpus in the
    session and persisted to the model registry dir
    (``$SPARK_GRAFT_MODEL_DIR``, default: the tracked repo-root
    ``models/`` directory, whose fixture artifacts are committed), so
    repeated queries and fresh processes pay model LOAD + inference,
    never a refit. The artifact key embeds a content fingerprint of the
    training corpus (see ``_model_path``), so a changed corpus refits
    rather than loading stale weights. Training happens at most once
    per corpus — exactly like fitting on a sample at 100 TB and
    broadcasting the artifact."""
    import os

    key = os.path.abspath(sf_dir)
    if key in _MODEL_MEMO:
        return _MODEL_MEMO[key]
    path = _model_path(sf_dir)
    model = None
    if persist and os.path.isdir(path):
        try:
            model = PipelineModel.load(path)
        except Exception:
            model = None  # corrupt/partial artifact: refit below
    if model is None:
        docs = score_text_expr(table(spark, sf_dir, "documents"), "text")
        model = train_sentiment_model(docs.select("text", "sentiment"))
        if persist:
            model.write().overwrite().save(path)
    if persist and not os.path.exists(
        os.path.join(path, PREDHASH_FILE)
    ):
        write_prediction_fingerprint(spark, sf_dir, model)
    _MODEL_MEMO[key] = model
    return model


# ---------------------------------------------------------------------------
# prediction-vector pinning: the strong check behind the rows-only
# contract (r7 verdict #3)
# ---------------------------------------------------------------------------

PREDHASH_FILE = "predhash.json"


def prediction_fingerprint_expr() -> F.Column:
    """Per-row fingerprint term of a prediction: a 32-bit md5 slice of
    ``doc_id:ml_sentiment`` as BIGINT. Summed over the corpus it gives
    an ORDER-INDEPENDENT fingerprint of the whole prediction vector —
    any single flipped label changes the sum. Same md5-slice idiom as
    the oracle harness's value hash."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("doc_id").cast("string"),
                    F.col("ml_sentiment"),
                )
            ),
            25,
            8,
        ),
        16,
        10,
    ).cast("bigint")


def expected_prediction_fingerprint(sf_dir: str):
    """The COMMITTED fingerprint for this corpus's fitted model, or
    None when the registry has none (fresh corpus: the first
    ``train_on_documents`` writes it). Lives inside the
    content-fingerprint-keyed model dir, so a regenerated corpus or
    refit model never resolves a stale pin."""
    import json
    import os

    p = os.path.join(_model_path(sf_dir), PREDHASH_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def write_prediction_fingerprint(
    spark: SparkSession, sf_dir: str, model: PipelineModel
) -> None:
    """Predict over the corpus once and pin the prediction vector:
    fingerprint sum, row count, the corpus agreement count, AND the
    per-lexicon-class (n_docs, n_agree) table (the band a future run
    must reproduce exactly — inference is deterministic JVM arithmetic
    over a committed model). The per-class table is what lets
    ``mllib_sentiment_agreement`` emit a literal-VALUES DuckDB oracle
    and graduate from the rows-only contract to the full hash check."""
    import json
    import os

    docs = score_text_expr(table(spark, sf_dir, "documents"), "text")
    pred = predict_sentiment(model, docs, "text")
    by_class = (
        pred.groupBy("sentiment")
        .agg(
            F.sum(prediction_fingerprint_expr()).alias("h"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                (F.col("ml_sentiment") == F.col("sentiment")).cast("int")
            ).alias("n_agree"),
        )
        .collect()
    )
    path = _model_path(sf_dir)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, PREDHASH_FILE), "w") as fh:
        json.dump(
            {
                "fingerprint": sum(int(r["h"]) for r in by_class),
                "n_docs": sum(int(r["n_docs"]) for r in by_class),
                "n_agree": sum(int(r["n_agree"]) for r in by_class),
                # NULL-sentiment groups are excluded from the pin (the
                # classifier coalesces null->Neutral so none should
                # exist; a defensive exclusion beats a TypeError from
                # sorting None against str, and beats rendering an
                # unquoted Python `None` into the literal-VALUES
                # oracle). ADVICE r9.
                "classes": sorted(
                    [
                        {
                            "sentiment": r["sentiment"],
                            "n_docs": int(r["n_docs"]),
                            "n_agree": int(r["n_agree"]),
                        }
                        for r in by_class
                        if r["sentiment"] is not None
                    ],
                    key=lambda d: d["sentiment"],
                ),
            },
            fh,
        )


def expected_agreement_table(sf_dir: str):
    """The committed per-class (sentiment, n_docs, n_agree) table for
    this corpus's fitted model, or None when the registry has no pin or
    a pre-classes pin (both mean: fall back to the rows-only contract
    until ``write_prediction_fingerprint`` runs)."""
    try:
        pin = expected_prediction_fingerprint(sf_dir)
    except (OSError, ValueError):
        # corpus dir missing/unreadable, or a truncated/corrupt
        # predhash.json (json.JSONDecodeError is a ValueError) ->
        # unfingerprintable; fall back to rows-only. ADVICE r9.
        return None
    if not pin or "classes" not in pin:
        return None
    return pin["classes"]


def predict_sentiment(model: PipelineModel, df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach ``ml_sentiment`` to any DataFrame with a text column.
    Pure narrow transform — streaming-safe."""
    pred = model.transform(df.withColumn("text", F.col(text_col)))
    idx_to_label = F.create_map(
        *[x for i, s in enumerate(LABELS) for x in (F.lit(float(i)), F.lit(s))]
    )
    return pred.withColumn(
        "ml_sentiment", F.element_at(idx_to_label, F.col("prediction"))
    ).drop("ml_tokens", "tf", "features", "rawPrediction", "probability", "prediction")
