"""Hash-keyed sampling/splits: reproducibility across partitionings, split
disjointness, membership stability under corpus growth."""

from __future__ import annotations

from pyspark.sql import Row

from breweries_etl_spark.operators.sampling import hash_sample, train_test_split


def _docs(spark, n=500):
    return spark.createDataFrame([Row(doc_id=i) for i in range(n)])


def test_sample_is_partitioning_invariant(spark):
    df = _docs(spark)
    s1 = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.2).collect()}
    s2 = {r["doc_id"] for r in hash_sample(df.repartition(17), "doc_id", 0.2).collect()}
    assert s1 == s2 and 0.1 < len(s1) / 500 < 0.3


def test_split_disjoint_and_exhaustive(spark):
    df = _docs(spark)
    train, test = train_test_split(df, "doc_id", 0.1)
    tr = {r["doc_id"] for r in train.collect()}
    te = {r["doc_id"] for r in test.collect()}
    assert tr.isdisjoint(te)
    assert tr | te == set(range(500))


def test_membership_stable_under_growth(spark):
    small = _docs(spark, 200)
    big = _docs(spark, 500)
    _, test_small = train_test_split(small, "doc_id", 0.1)
    _, test_big = train_test_split(big, "doc_id", 0.1)
    small_ids = {r["doc_id"] for r in test_small.collect()}
    big_ids = {r["doc_id"] for r in test_big.collect()}
    # every row of the smaller corpus keeps its split when the corpus grows
    assert small_ids == {i for i in big_ids if i < 200}


def test_stratified_sample_nesting_and_fractions(spark, sf_dir):
    from breweries_etl_spark.operators.sampling import (
        hash_sample,
        stratified_hash_sample,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 0.5, "de": 1.0, "zh": 0.1}
    )
    got = out.groupBy("lang").count().collect()
    langs = {r["lang"] for r in got}
    assert langs <= {"en", "de", "zh"}  # unlisted strata dropped
    # de at 1.0 keeps every de row
    n_de = docs.filter("lang = 'de'").count()
    assert next(r["count"] for r in got if r["lang"] == "de") == n_de
    # the en stratum equals plain hash_sample of the en slice (nesting)
    en_plain = {r["doc_id"] for r in
                hash_sample(docs.filter("lang='en'"), "doc_id", 0.5)
                .select("doc_id").collect()}
    en_strat = {r["doc_id"] for r in
                out.filter("lang='en'").select("doc_id").collect()}
    assert en_plain == en_strat


def test_stratified_sample_partition_invariant(spark, sf_dir):
    from breweries_etl_spark.operators.sampling import stratified_hash_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {r["doc_id"] for r in stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 0.3, "fr": 0.7}).collect()}
    b = {r["doc_id"] for r in stratified_hash_sample(
        docs.repartition(17), "doc_id", "lang", {"en": 0.3, "fr": 0.7}).collect()}
    assert a == b


def test_weighted_sample_deterministic_and_weight_biased(spark):
    from pyspark.sql import functions as F

    from breweries_etl_spark.operators.sampling import weighted_sample

    # two weight classes: ids < 100 weigh 50x more than ids >= 100
    df = spark.createDataFrame(
        [Row(doc_id=i, w=500 if i < 100 else 10) for i in range(1000)]
    )
    s1 = [r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 100).collect()]
    s2 = [
        r["doc_id"]
        for r in weighted_sample(df.repartition(13), "doc_id", "w", 100).collect()
    ]
    assert sorted(s1) == sorted(s2)  # partitioning-invariant membership
    assert len(set(s1)) == 100  # without replacement, exactly k
    heavy = sum(1 for i in s1 if i < 100)
    # heavy class is 10% of rows but ~50x weight -> should dominate the
    # sample (expectation ~85; loose bound to stay non-flaky)
    assert heavy > 50


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from breweries_etl_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [Row(doc_id=1, w=0), Row(doc_id=2, w=-3), Row(doc_id=3, w=5)]
    )
    out = [r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 10).collect()]
    assert out == [3]


def test_weighted_sample_invariant_under_weight_scaling(spark):
    from pyspark.sql import functions as F

    from breweries_etl_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [Row(doc_id=i, w=(i % 7) + 1) for i in range(400)]
    )
    base = sorted(
        r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 40).collect()
    )
    # A-ES keys ln(u)/w scale by 1/c when weights scale by c: the ORDER
    # (hence the selected sample) is invariant under any positive
    # rescaling — the defining property of proportional sampling.
    scaled = df.withColumn("w", F.col("w") * 1000)
    got = sorted(
        r["doc_id"] for r in weighted_sample(scaled, "doc_id", "w", 40).collect()
    )
    assert got == base


def test_weighted_sample_k_exceeding_population(spark):
    from breweries_etl_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([Row(doc_id=i, w=i + 1) for i in range(5)])
    out = sorted(r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 100).collect())
    assert out == [0, 1, 2, 3, 4]
