"""Training-mix sampling and sequence packing invariants."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_stratified_sample_rates_and_determinism(docs):
    from gitnexus_spark.operators.sampling import stratified_sample

    fr = {"src0": 1.0, "src1": 0.5, "src4": 0.0}
    out = stratified_sample(docs, "source", fr, id_col="doc_id",
                            default=0.0)
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    totals = {r["source"]: r["n"] for r in
              docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts.get("src0") == totals["src0"]       # rate 1.0 keeps all
    assert "src4" not in counts                        # rate 0.0 drops all
    assert set(counts) <= {"src0", "src1"}             # default drops rest
    got1 = {r["doc_id"] for r in out.collect()}
    got2 = {r["doc_id"] for r in
            stratified_sample(docs, "source", fr, id_col="doc_id").collect()}
    assert got1 == got2                                # identical re-run

    # the fold is uniform: a 0.5 stratum lands near half (Binomial 3-sigma)
    n1, k1 = totals["src1"], counts.get("src1", 0)
    assert abs(k1 - 0.5 * n1) <= 3 * (n1 * 0.25) ** 0.5 + 1


def test_pack_sequences_invariants(spark):
    from gitnexus_spark.operators.sampling import pack_sequences

    rows = [("a", i, t) for i, t in
            enumerate([100, 200, 300, 50, 512, 600, 10, 10])] + \
           [("b", i, t) for i, t in enumerate([512, 1, 511])]
    df = spark.createDataFrame(rows, "src string, ord long, toks long")
    out = pack_sequences(df, "src", "ord", "toks", budget=512) \
        .orderBy("src", "ord").collect()

    by_part = {}
    for r in out:
        by_part.setdefault(r["src"], []).append(r)
    for part, seq_rows in by_part.items():
        cum = 0
        for r in seq_rows:
            assert r["seq_id"] == cum // 512          # streaming-concat bin
            assert r["seq_offset"] == cum - r["seq_id"] * 512
            assert 0 <= r["seq_offset"] < 512
            cum += r["toks"]
    # seq_ids are contiguous non-decreasing within a stratum
    a_ids = [r["seq_id"] for r in by_part["a"]]
    assert a_ids == sorted(a_ids)
    # an over-budget doc (600) still advances the counter past its span
    assert by_part["b"][1]["seq_id"] == 1              # starts at offset 512


def test_sampling_plan_shapes(spark, docs):
    """Scale shape: the mix sample is a scan-local filter (NO exchange
    anywhere in the plan); packing costs exactly ONE exchange — the
    window's hash partitioning on the stratum column."""
    import contextlib
    import io
    import re

    from gitnexus_spark.functions.text import with_token_count
    from gitnexus_spark.operators.sampling import (pack_sequences,
                                                   stratified_sample)

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    samp = stratified_sample(docs, "source", {"src0": 0.5}, id_col="doc_id")
    p1 = plan_of(samp)
    assert not re.search(r"^\(\d+\) Exchange", p1, re.M), p1

    packed = pack_sequences(with_token_count(docs), "source", "doc_id",
                            "n_tokens", budget=512)
    p2 = plan_of(packed)
    n_ex = len(re.findall(r"^\(\d+\) Exchange", p2, re.M))
    assert n_ex == 1, p2
    assert "hashpartitioning(source" in p2, p2
