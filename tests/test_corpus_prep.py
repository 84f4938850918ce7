"""prepare_corpus: staged gates, precedence, and full-coverage output."""

import pytest

from gitnexus_spark.operators.corpus_prep import prepare_corpus


@pytest.fixture(scope="module")
def prepped(spark):
    # varied filler that passes quality (stopwords, length) without
    # tripping the repetition gate (all bigrams distinct)
    def filler(tag, n=60):
        return " ".join(f"{tag}{i} the" if i % 2 == 0 else f"{tag}{i}"
                        for i in range(n))

    good_b = filler("beta")
    near_d = good_b.rsplit(" ", 1)[0] + " changed"
    eval_text = "alpha beta gamma delta epsilon zeta"
    contaminated = filler("eps") + " alpha beta gamma delta"
    rows = [
        (1, "a"),                        # low_quality (checked before repetition)
        (2, good_b),                     # kept (cluster keeper)
        (3, good_b),                     # exact_dup of 2
        (4, near_d),                     # near_dup of 2
        (5, contaminated),               # contaminated
        (6, filler("zet")),              # kept, clean
        (7, " ".join(["spam"] * 60)),    # repetitive (modal bigram = 1.0)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    ev = spark.createDataFrame([(100, eval_text)], ["doc_id", "text"])
    return {r["doc_id"]: r for r in prepare_corpus(docs, ev).collect()}


def test_every_doc_decided(prepped):
    assert set(prepped) == {1, 2, 3, 4, 5, 6, 7}
    for r in prepped.values():
        assert r["kept"] in (0, 1)
        assert (r["kept"] == 1) == (r["drop_reason"] is None)


def test_gate_reasons(prepped):
    assert prepped[1]["drop_reason"] == "low_quality"
    assert prepped[3]["drop_reason"] == "exact_dup"
    assert prepped[4]["drop_reason"] == "near_dup"
    assert prepped[5]["drop_reason"] == "contaminated"
    assert prepped[7]["drop_reason"] == "repetitive"
    assert prepped[2]["kept"] == 1
    assert prepped[6]["kept"] == 1


def test_signals_surface(prepped):
    # the decision table carries the raw signals for auditing
    assert prepped[7]["top_gram_frac"] == 1.0
    assert prepped[5]["eval_hits"] >= 1
    assert prepped[1]["quality"] < 0.30


def test_precedence_dedup_before_contamination(spark):
    # a doc that is BOTH an exact duplicate and contaminated reports the
    # dedup reason (gates run in pipeline order)
    def filler(tag, n=60):
        return " ".join(f"{tag}{i} the" if i % 2 == 0 else f"{tag}{i}"
                        for i in range(n))

    text = filler("mix") + " alpha beta gamma delta"
    docs = spark.createDataFrame(
        [(10, text), (11, text)], ["doc_id", "text"])
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in prepare_corpus(docs, ev).collect()}
    assert got[11]["drop_reason"] == "exact_dup"
    assert got[10]["drop_reason"] == "contaminated"
