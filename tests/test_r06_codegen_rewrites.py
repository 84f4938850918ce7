"""Round-6 optimization equivalence gates.

Every rewrite of this round replaced an interpreted higher-order-function
plan with a codegen explode/aggregate plan (or clique pairs with
connectivity-equivalent star edges). These tests pin the contract the
oracle can only spot-check: the optimized form must be BIT-IDENTICAL to
the row-preserving original on adversarial inputs (empty text, repeated
tokens, CJK, stopword-only, single-word, whitespace runs).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


ADVERSARIAL = [
    (0, "", "src0"),
    (1, "   ", "src0"),
    (2, "the the the the the", "src0"),
    (3, "one", "src1"),
    (4, "der die das und ist von zu mit den nicht", "src1"),
    (5, "el la de que y en los del las por", "src1"),
    (6, "一二三四五六七八", "src2"),
    (7, "mixed  whitespace\t and\nnewlines   here", "src2"),
    (8, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "src2"),
    (9, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "src3"),
    (10, "a b c d e f g h i j k l m n o p q r s t u v w x y z", "src3"),
    (11, "the and of to in is that for with on le la de et les", "src3"),
    (12, "Entity_1 founded Entity_2 and Entity_3", "src0"),
]


@pytest.fixture(scope="module")
def adv_docs(spark):
    return spark.createDataFrame(ADVERSARIAL, ["doc_id", "text", "source"])


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_simhash_agg_matches_hof(adv_docs):
    from gitnexus_spark.operators.dedup import simhash, simhash_agg

    old = simhash(adv_docs.select("doc_id", "text")).select(
        "doc_id", F.expr("concat_ws('', simhash)").alias("h"))
    new = simhash_agg(adv_docs).select(
        "doc_id", F.expr("concat_ws('', simhash)").alias("h"))
    assert _rows(old) == _rows(new)


def test_minhash_signature_agg_matches_hof(adv_docs):
    from gitnexus_spark.operators.dedup import (minhash_signature,
                                                minhash_signature_agg)

    old = minhash_signature(adv_docs.select("doc_id", "text")).select(
        "doc_id", F.expr("cast(sig as string)").alias("s"))
    new = minhash_signature_agg(adv_docs).select(
        "doc_id", F.expr("cast(sig as string)").alias("s"))
    assert _rows(old) == _rows(new)


def test_gram_stream_distinct_matches_shingles(adv_docs):
    from gitnexus_spark.operators.dedup import gram_stream, with_shingles

    for n in (2, 4):
        old = (with_shingles(adv_docs.select("doc_id", "text"), n=n)
               .select("doc_id", F.explode("shingles").alias("g")).distinct())
        new = gram_stream(adv_docs.select("doc_id", "text"), ["doc_id"],
                          n=n).distinct()
        assert _rows(old) == _rows(new), f"n={n}"


def test_decontaminate_count_distinct_matches_prededup(adv_docs):
    """The stream form retains positional duplicates and restores
    distinctness via count_distinct; must equal the array_distinct
    pre-dedup form."""
    from gitnexus_spark.operators.dedup import decontaminate, with_shingles

    train = adv_docs.filter(F.col("doc_id") % 3 != 0)
    ev = adv_docs.filter(F.col("doc_id") % 3 == 0)
    ev_old = (with_shingles(ev.select("text"), n=2)
              .select(F.explode("shingles").alias("gram")).distinct())
    tr_old = (with_shingles(train.select("doc_id", "text"), n=2)
              .select("doc_id", F.explode("shingles").alias("gram")))
    hits = (tr_old.join(F.broadcast(ev_old), "gram")
            .groupBy("doc_id").agg(F.count("*").alias("eval_hits")))
    old = (train.select("doc_id").join(hits, "doc_id", "left")
           .select("doc_id",
                   F.coalesce("eval_hits", F.lit(0)).alias("eval_hits"),
                   (F.coalesce("eval_hits", F.lit(0)) >= 1).cast("int")
                   .alias("contaminated")))
    new = decontaminate(train, ev, shingle_n=2, min_hits=1)
    assert _rows(old) == _rows(new)


def test_text_stats_agg_matches_with_chain(adv_docs):
    from gitnexus_spark.functions.text import (text_stats_agg, with_lang_id,
                                               with_quality_score,
                                               with_token_count)

    cols = ["doc_id", "n_tokens", "token_estimate", "lang_pred", "quality"]
    old = with_quality_score(with_lang_id(with_token_count(adv_docs))) \
        .select(*cols)
    new = text_stats_agg(adv_docs).select(*cols)
    assert old.schema == new.schema
    assert _rows(old) == _rows(new)


def test_quality_agg_matches_with_quality_score(adv_docs):
    from gitnexus_spark.functions.text import quality_agg, with_quality_score

    old = with_quality_score(adv_docs).select("doc_id", "quality")
    new = quality_agg(adv_docs)
    assert _rows(old) == _rows(new)


def test_fingerprint_agg_matches_with_fingerprint(adv_docs):
    from gitnexus_spark.functions.text import (fingerprint_agg,
                                               with_fingerprint)

    old = with_fingerprint(adv_docs).select(
        "doc_id", F.expr("cast(fingerprint as string)").alias("fp"))
    new = fingerprint_agg(adv_docs).select(
        "doc_id", F.expr("cast(fingerprint as string)").alias("fp"))
    assert _rows(old) == _rows(new)


def test_near_dup_star_edges_match_clique_pairs(spark):
    """Star edges per LSH band group must produce the same components as
    the full C(k,2) clique pairs (same transitive closure)."""
    from gitnexus_spark.operators.components import connected_components
    from gitnexus_spark.operators.dedup import (minhash_lsh_pairs,
                                                near_dup_clusters)

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(i, base if i < 6 else f"{base} extra_{i % 3}") for i in range(12)]
        + [(i, f"unique text number {i} with tail_{i}") for i in range(12, 18)],
        ["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs, num_hashes=16, bands=8)
    pad = 20
    edges = pairs.select(
        F.lpad(F.col("id_a").cast("string"), pad, "0").alias("src"),
        F.lpad(F.col("id_b").cast("string"), pad, "0").alias("dst"))
    comp = connected_components(edges).select(
        F.col("vertex").cast("bigint").alias("doc_id"),
        F.col("component").cast("bigint").alias("cluster_id"))
    out = (docs.select("doc_id").join(comp, "doc_id", "left")
           .withColumn("cluster_id",
                       F.coalesce("cluster_id", F.col("doc_id"))))
    sizes = out.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    old = out.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).cast("int")
        .alias("is_keeper"))
    new = near_dup_clusters(docs, num_hashes=16, bands=8)
    assert _rows(old) == _rows(new)
