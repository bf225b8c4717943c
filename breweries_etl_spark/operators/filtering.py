"""Gopher-style corpus quality filtering for LLM training-data
pipelines: per-document repetition statistics, composition heuristics
with keep/drop flags, and a corpus-level duplicate-n-gram signal.

The filter family follows the published recipes (Rae et al. 2021,
"Scaling Language Models: ... Gopher", arXiv:2112.11446, Table A1;
Raffel et al. 2020, C4, arXiv:1910.10683) re-expressed as Spark-native
column expressions and aggregates — no Python in the hot path.

Scale design:
- ``repetition_stats`` needs per-document token frequencies, which is
  inherently a (doc, token) aggregation. It streams BOTH the unigram and
  bigram token streams out of ONE explode over one scan (tagged structs),
  then two hash aggregations — the text column itself never shuffles,
  only (doc_id, n, token) triples and their partial counts.
- ``gopher_quality_flags`` computes every per-row scalar signal
  (mean word length, symbol ratio, stopword hits) in a second NARROW
  projection over the same parquet scan and joins it to the repetition
  aggregate on doc_id — two pruned scans of (doc_id, text) beat carrying
  the scalars through the token shuffle (which would widen every token
  row), and the join ships only narrow metric rows.
- ``ngram_dup_fraction`` never materializes candidate pairs: document
  frequency per shingle is a window count over the shingle shuffle (one
  scan, no self-join, no persist), so a boilerplate shingle shared by k
  documents costs k rows, never k².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.partitioning import ensure_parallelism
from .text import (
    STOPWORDS_RE,
    normalize_text_expr,
    shingle_hashes_expr,
    shingled_zip,
)


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition signals over normalized words: word/
    distinct-word counts, duplicate-word fraction, most-common-word
    fraction, and most-common-bigram fraction (the Gopher "fraction of
    characters in most frequent n-gram" family, word-count flavored so
    integer ratios hash-match any engine).

    Documents whose normalized text is empty produce no output row (they
    have no tokens to count — same contract as the dedup family).
    """
    text = F.col(text_col)
    words = F.split(normalize_text_expr(text), " ")
    z = shingled_zip(words, 2)
    bigrams = F.transform(z, lambda s: F.concat_ws(" ", s["0"], s["1"]))
    tagged = F.concat(
        F.transform(words, lambda w: F.struct(F.lit(1).alias("n"), w.alias("tok"))),
        F.transform(bigrams, lambda b: F.struct(F.lit(2).alias("n"), b.alias("tok"))),
    )
    stream = (
        ensure_parallelism(df.select(id_col, text_col))
        .select(F.col(id_col), F.explode(tagged).alias("t"))
        .select(id_col, F.col("t.n").alias("n"), F.col("t.tok").alias("tok"))
        .filter(F.col("tok") != "")  # lone '' token from empty text
    )
    counts = stream.groupBy(id_col, "n", "tok").agg(F.count(F.lit(1)).alias("c"))
    uni = F.col("n") == 1
    bi = F.col("n") == 2
    per_doc = counts.groupBy(id_col).agg(
        F.sum(F.when(uni, F.col("c"))).cast("long").alias("n_words"),
        F.count(F.when(uni, True)).cast("long").alias("n_distinct_words"),
        F.max(F.when(uni, F.col("c"))).cast("long").alias("top_word_c"),
        F.sum(F.when(bi, F.col("c"))).cast("long").alias("n_bigrams"),
        F.max(F.when(bi, F.col("c"))).cast("long").alias("top_bigram_c"),
    )
    n_words = F.col("n_words").cast("double")
    return per_doc.select(
        id_col,
        "n_words",
        "n_distinct_words",
        F.round(F.lit(1.0) - F.col("n_distinct_words") / n_words, 6).alias(
            "dup_word_fraction"
        ),
        F.round(F.col("top_word_c") / n_words, 6).alias("top_word_fraction"),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce(
            F.round(F.col("top_bigram_c") / F.col("n_bigrams").cast("double"), 6),
            F.lit(0.0),
        ).alias("top_bigram_fraction"),
    )


# Gopher Table A1 thresholds (word-count flavored where the paper uses
# character fractions; values are the published ones where they carry
# over directly).
WORD_COUNT_MIN = 50
WORD_COUNT_MAX = 100_000
MEAN_WORD_LEN_MIN = 3.0
MEAN_WORD_LEN_MAX = 10.0
SYMBOL_WORD_RATIO_MAX = 0.1
MIN_STOPWORD_HITS = 2
TOP_BIGRAM_FRACTION_MAX = 0.2


def gopher_quality_flags(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Gopher-style keep/drop flags plus the numeric signals
    behind them: word-count bounds, mean word length bounds, symbol-to-
    word ratio ('#' and '...'), minimum stopword hits, and the
    most-common-bigram repetition cap — ``keep`` is their conjunction.

    Mean word length uses the joined-text identity: the normalized text
    is words joined by single spaces, so Σ|word| = len(norm) − (n_words
    − 1) — no second tokenization pass, pure integer arithmetic that any
    engine reproduces bit-for-bit.
    """
    text = F.col(text_col)
    norm = normalize_text_expr(text)
    n_words_sc = F.when(F.length(norm) == 0, F.lit(0)).otherwise(
        F.size(F.split(norm, " "))
    )
    sum_word_len = F.length(norm) - (n_words_sc - F.lit(1))
    hash_count = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    ellipsis_count = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    stop_hits = F.size(F.regexp_extract_all(text, F.lit(STOPWORDS_RE), 0))
    # NULL (not 0) divisor for empty/whitespace-only docs: under ANSI
    # mode a literal 0 divisor is a runtime DIVIDE_BY_ZERO error, and
    # these rows are dropped by the inner join with repetition_stats
    # (which emits no row for token-less docs) anyway.
    n_words_div = F.when(n_words_sc > 0, n_words_sc.cast("double"))
    scalars = ensure_parallelism(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.round(sum_word_len.cast("double") / n_words_div, 6).alias("mean_word_len"),
        F.round((hash_count + ellipsis_count).cast("double") / n_words_div, 6).alias(
            "symbol_ratio"
        ),
        stop_hits.cast("long").alias("stopword_hits"),
    )
    reps = repetition_stats(df, text_col=text_col, id_col=id_col)
    out = reps.join(scalars, id_col)
    flags = {
        "ok_word_count": (F.col("n_words") >= WORD_COUNT_MIN)
        & (F.col("n_words") <= WORD_COUNT_MAX),
        "ok_mean_word_len": (F.col("mean_word_len") >= MEAN_WORD_LEN_MIN)
        & (F.col("mean_word_len") <= MEAN_WORD_LEN_MAX),
        "ok_symbol_ratio": F.col("symbol_ratio") <= SYMBOL_WORD_RATIO_MAX,
        "ok_stopwords": F.col("stopword_hits") >= MIN_STOPWORD_HITS,
        "ok_repetition": F.col("top_bigram_fraction") <= TOP_BIGRAM_FRACTION_MAX,
    }
    keep = None
    for expr in flags.values():
        keep = expr if keep is None else (keep & expr)
    return out.select(
        id_col,
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "stopword_hits",
        "dup_word_fraction",
        "top_bigram_fraction",
        *[expr.alias(name) for name, expr in flags.items()],
        keep.alias("keep"),
    )


def ngram_dup_fraction(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 5
) -> DataFrame:
    """Per-document fraction of its DISTINCT word n-grams that occur in
    at least one OTHER document — the corpus-level near-duplication
    signal C4-style span dedup thresholds on.

    One scan: shingle hashes explode once, document frequency per
    shingle is a window count over the shingle-partitioned shuffle (each
    document contributes each shingle at most once, so the count IS the
    doc frequency), and the per-document rollup reuses the rows in
    flight — no self-join, no persisted shingle sets, no pair blowup on
    boilerplate shingles (k documents sharing a shingle cost k rows).
    """
    sh = ensure_parallelism(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode(shingle_hashes_expr(F.col(text_col), n)).alias("s"),
    )
    w = Window.partitionBy("s")
    with_df = sh.withColumn("doc_freq", F.count(F.lit(1)).over(w))
    return (
        with_df.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.when(F.col("doc_freq") >= 2, True)).alias("n_shared"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_shared",
            F.round(F.col("n_shared") / F.col("n_shingles"), 6).alias(
                "shared_fraction"
            ),
        )
    )


def classifier_weights(dim: int = 256, seed: int = 13) -> list[float]:
    """Deterministic stand-in for trained fasttext/logreg quality-filter
    weights (the CCNet / LLaMA-pipeline component): seeded normals, one
    weight per hash bucket. In production these come from a trained
    model; the SHAPE — a dim-sized dense vector shipped to executors as
    plan literals — is identical either way."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return [float(x) for x in rng.randn(dim)]


def classifier_quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
    seed: int = 13,
    threshold: float = 0.5,
) -> DataFrame:
    """Hashed-linear text classifier score — the fasttext-style quality
    filter LLM corpus pipelines run over every document, as a PURE SCAN:

    - tokens hash to buckets with the same portable md5 arithmetic as
      ``text.feature_hash_counts`` (no vocabulary table to join);
    - the weight vector rides the plan as a literal array (broadcast
      with the task binary — no driver state, no shuffle);
    - score = sigmoid(mean over tokens of w[bucket(token)]), computed
      per row by an in-row fold. NOTHING shuffles — at 100 TB this is
      scan-speed, embarrassingly parallel, and the exact shape a real
      trained linear model drops into (swap the literals).

    Token order does not affect the result beyond float associativity
    (~1e-16, far below the round-6 output), so values hash-match the
    SQL replay."""
    score = classifier_score_expr(F.col(text_col), dim, seed)
    return df.select(
        F.col(id_col),
        score.alias("quality_score"),
        (score >= threshold).alias("keep"),
    )


def classifier_score_expr(text: Column, dim: int = 256, seed: int = 13) -> Column:
    """The hashed-linear classifier score as a plain column expression
    (round-6 sigmoid of the mean bucket weight), so composite pipelines
    can evaluate it in the SAME scan as other signals."""
    from .text import tokens_expr

    weights = classifier_weights(dim, seed)
    w_arr = F.array(*[F.lit(w) for w in weights])
    toks = tokens_expr(F.lower(text))
    z = F.aggregate(
        F.transform(toks, lambda t: F.element_at(
            w_arr,
            (F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % dim + 1).cast("int"),
        )),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ) / F.size(toks)
    return F.when(
        F.size(toks) > 0, F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    ).otherwise(F.lit(0.5))


def calibration_bins(
    df: DataFrame,
    text_col: str = "text",
    n_bins: int = 10,
    label_threshold: float = 0.5,
    dim: int = 256,
    seed: int = 13,
) -> DataFrame:
    """Reliability-diagram bins for the hashed-linear quality classifier
    against an independent heuristic label — the calibration check a
    corpus pipeline runs before trusting a filter's scores as sampling
    weights (Guo et al. 2017's ECE, computed per bin).

    Predicted score = ``classifier_score_expr`` (round-6 sigmoid);
    "truth" = the length/stopword/punctuation heuristic
    (``quality_score_expr`` ≥ ``label_threshold``) — two INDEPENDENT
    signals evaluated in the SAME single scan (no join). Binning rides
    the scaled-integer path (`round(score·1e6)` then integer div) so
    bin edges are engine-independent — a raw ``floor(score*10)`` on
    doubles can land boundary scores differently per engine.

    Plan: one scan → one 10-row hash aggregate. Per-bin mean score is
    a round-6 decimal sum over round-6 terms (order-independent);
    |gap| = |mean_pred − frac_positive| is the per-bin ECE term.
    Scale: map-side combine reduces every partition to ≤ n_bins rows —
    scan-bound at 100 TB."""
    from .text import quality_score_expr

    text = F.col(text_col)
    pred = classifier_score_expr(text, dim, seed)
    label = (quality_score_expr(text) >= F.lit(label_threshold)).cast("long")
    step = int(1000000 // n_bins)
    binned = df.select(
        F.round(pred * F.lit(1000000.0)).cast("long").alias("_scaled"),
        pred.alias("pred"),
        label.alias("pos"),
    ).select(
        F.least(F.lit(n_bins - 1).cast("long"), F.expr(f"_scaled div {step}"))
        .alias("bin"),
        "pred",
        "pos",
    )
    n = F.count(F.lit(1))
    return (
        binned.groupBy("bin")
        .agg(
            n.alias("n"),
            F.round(
                F.sum(F.col("pred").cast("decimal(18,6)")).cast("double") / n.cast("double"), 6
            ).alias("mean_pred"),
            F.sum("pos").alias("n_positive"),
            F.round(
                F.sum("pos").cast("double") / n.cast("double"), 6
            ).alias("frac_positive"),
        )
        .withColumn(
            "abs_gap", F.round(F.abs(F.col("mean_pred") - F.col("frac_positive")), 6)
        )
    )


def ece_summary(
    df: DataFrame,
    text_col: str = "text",
    n_bins: int = 10,
    label_threshold: float = 0.5,
) -> DataFrame:
    """Expected and maximum calibration error (Guo et al. 2017) of the
    hashed-linear classifier vs the heuristic label, as ONE row — the
    scalar gate a pipeline alarms on, where ``calibration_bins`` is the
    per-bin diagnostic it drills into.

    Same scan/binning as calibration_bins (scaled-int edges); per-bin
    gap terms fold as floor(n_b·|p̄_b−ȳ_b|·10⁸) fixed point over the
    bounded bin relation; MCE is a max over the same bins with a 6-dp
    floor quantization. Output one row: (n, n_bins_used, ece, mce)."""
    from .text import quality_score_expr

    text = F.col(text_col)
    pred = classifier_score_expr(text)
    label = (quality_score_expr(text) >= F.lit(label_threshold)).cast("long")
    step = int(1000000 // n_bins)
    binned = df.select(
        F.round(pred * F.lit(1000000.0)).cast("long").alias("_scaled"),
        pred.alias("pred"),
        label.alias("pos"),
    ).select(
        F.least(F.lit(n_bins - 1).cast("long"), F.expr(f"_scaled div {step}"))
        .alias("bin"),
        "pred",
        "pos",
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_b"),
        F.sum(F.round(F.col("pred"), 6).cast("decimal(18,6)")).alias(
            "p_sum"
        ),
        F.sum("pos").alias("pos_b"),
    )
    from .hypotests import dec_double, dec_double_wide

    nb = F.col("n_b").cast("double")
    gap = F.abs(
        dec_double(F.col("p_sum")) / nb
        - F.col("pos_b").cast("double") / nb
    )
    folded = per_bin.agg(
        F.sum("n_b").alias("n"),
        F.count(F.lit(1)).alias("n_bins_used"),
        F.sum(
            F.floor(nb * gap * F.lit(1e8)).cast("decimal(38,0)")
        ).alias("ece_fp"),
        F.max(F.floor(gap * F.lit(1e6)).cast("long")).alias("mce_fp"),
    )
    return folded.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_bins_used").cast("long").alias("n_bins_used"),
        F.round(
            dec_double_wide(F.col("ece_fp"))
            / F.lit(1e8)
            / F.col("n").cast("double"),
            6,
        ).alias("ece"),
        (F.col("mce_fp").cast("double") / F.lit(1e6)).alias("mce"),
    )
