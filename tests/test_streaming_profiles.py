"""Streaming sketch-profile maintenance: the maintained table must equal
a from-scratch batch build over everything seen (sketch merge is
lossless), commit once per micro-batch, and tolerate replay."""

import shutil

import pytest
from pyspark.sql import functions as F

from gitnexus_spark.operators.sketches import distinct_profile
from gitnexus_spark.sources.snapshots import SnapshotWriter
from gitnexus_spark.streaming.profiles import (merge_profile_into,
                                               start_distinct_profile_stream)


@pytest.fixture()
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ["in", "tbl", "ckpt"]}
    yield d
    shutil.rmtree(tmp_path, ignore_errors=True)


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
        ((F.col("id") * 37 + 11) % 997).cast("string").alias("entity"))


def _run_stream(spark, dirs):
    stream = (spark.readStream.schema("lang string, entity string")
              .option("maxFilesPerTrigger", 1).parquet(dirs["in"]))
    q = start_distinct_profile_stream(
        stream, dirs["tbl"], ["lang"], "entity", dirs["ckpt"])
    q.awaitTermination(120)


def test_streaming_profile_equals_batch(spark, dirs):
    # two files -> two micro-batches (maxFilesPerTrigger=1)
    _mk(spark, 0, 4000).coalesce(1).write.mode("append").parquet(dirs["in"])
    _mk(spark, 4000, 9000).coalesce(1).write.mode("append").parquet(dirs["in"])
    _run_stream(spark, dirs)

    w = SnapshotWriter(spark)
    got = {r["lang"]: r["approx_distinct"]
           for r in w.read(dirs["tbl"]).collect()}
    want = {r["lang"]: r["approx_distinct"]
            for r in distinct_profile(_mk(spark, 0, 9000),
                                      ["lang"], "entity").collect()}
    assert got == want  # IDENTICAL estimates, not just close
    # one commit per non-empty micro-batch
    assert len(w.history(dirs["tbl"])) >= 2

    # a later stream run folds new data in without touching history
    _mk(spark, 9000, 12000).coalesce(1).write.mode("append").parquet(dirs["in"])
    _run_stream(spark, dirs)
    got2 = {r["lang"]: r["approx_distinct"]
            for r in w.read(dirs["tbl"]).collect()}
    want2 = {r["lang"]: r["approx_distinct"]
             for r in distinct_profile(_mk(spark, 0, 12000),
                                       ["lang"], "entity").collect()}
    assert got2 == want2


def test_epoch_guard_skips_replayed_batches(spark, dirs):
    """Re-running the stream with a FRESH checkpoint replays the same
    files under the same epoch ids; the manifest epoch guard must skip
    them — table bytes and history length unchanged."""
    _mk(spark, 0, 4000).coalesce(1).write.mode("append").parquet(dirs["in"])
    _run_stream(spark, dirs)
    w = SnapshotWriter(spark)
    before = {r["lang"]: r["approx_distinct"]
              for r in w.read(dirs["tbl"]).collect()}
    n_commits = len(w.history(dirs["tbl"]))

    shutil.rmtree(dirs["ckpt"], ignore_errors=True)  # force full replay
    _run_stream(spark, dirs)
    after = {r["lang"]: r["approx_distinct"]
             for r in w.read(dirs["tbl"]).collect()}
    assert after == before
    assert len(w.history(dirs["tbl"])) == n_commits


def test_epoch_guard_is_scoped_to_the_checkpoint(spark, tmp_path):
    """Epoch ids restart at 0 under a new checkpoint location, so the
    guard must only compare tags from the same checkpoint namespace — a
    fresh-checkpoint run against an existing table must NOT be skipped
    (the old un-namespaced guard silently dropped every batch until the
    new run's epoch_id overtook the old run's max)."""
    from gitnexus_spark.streaming.profiles import _last_epoch, _run_ns

    tbl = str(tmp_path / "tbl")
    w = SnapshotWriter(spark)
    ns_a, ns_b = _run_ns(str(tmp_path / "ckptA")), _run_ns(str(tmp_path / "ckptB"))
    assert ns_a != ns_b
    # same path -> same namespace (wipe-in-place is treated as replay,
    # which test_epoch_guard_skips_replayed_batches depends on)
    assert _run_ns(str(tmp_path / "ckptA")) == ns_a

    merge_profile_into(
        w, tbl, distinct_profile(_mk(spark, 0, 1000), ["lang"], "entity"),
        ["lang"], tag=f"epoch-{ns_a}-5")
    assert _last_epoch(w, tbl, ns_a) == 5   # own lineage: replay guard on
    assert _last_epoch(w, tbl, ns_b) == -1  # fresh checkpoint: processes


def test_partial_group_delta_keeps_other_groups(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    w = SnapshotWriter(spark)
    merge_profile_into(
        w, tbl, distinct_profile(_mk(spark, 0, 3000), ["lang"], "entity"),
        ["lang"])
    en_before = {r["lang"]: r["approx_distinct"]
                 for r in w.read(tbl).collect()}["en"]
    # delta touching only 'de'
    de_only = _mk(spark, 3000, 5000).filter(F.col("lang") == "de")
    merge_profile_into(
        w, tbl, distinct_profile(de_only, ["lang"], "entity"), ["lang"])
    got = {r["lang"]: r["approx_distinct"] for r in w.read(tbl).collect()}
    assert got["en"] == en_before  # untouched group preserved exactly
    assert set(got) == {"en", "de"}


def test_quantile_profile_stream(spark, dirs):
    """Maintained KLL profile: exact n per group, quantiles within the
    rank-error envelope of the full data."""
    from gitnexus_spark.operators.sketches import rollup_quantiles
    from gitnexus_spark.streaming.profiles import \
        start_quantile_profile_stream

    def mk(lo, hi):
        return spark.range(lo, hi).select(
            F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
            (F.col("id") % 1000).alias("tokens"))

    mk(0, 3000).coalesce(1).write.mode("append").parquet(dirs["in"])
    mk(3000, 8000).coalesce(1).write.mode("append").parquet(dirs["in"])
    stream = (spark.readStream.schema("lang string, tokens long")
              .option("maxFilesPerTrigger", 1).parquet(dirs["in"]))
    q = start_quantile_profile_stream(
        stream, dirs["tbl"], ["lang"], "tokens", dirs["ckpt"])
    q.awaitTermination(120)

    w = SnapshotWriter(spark)
    prof = w.read(dirs["tbl"])
    n_by_lang = {r["lang"]: r["n"] for r in prof.collect()}
    want_n = {r["lang"]: r["cnt"] for r in
              mk(0, 8000).groupBy("lang")
              .agg(F.count("*").alias("cnt")).collect()}
    assert n_by_lang == want_n  # exact additive counts
    med = {r["lang"]: r["q_0_5"] for r in
           rollup_quantiles(prof, ["lang"], [0.5]).collect()}
    for v in med.values():
        # tokens uniform over 0..999 in every batch -> median ~ 500
        assert abs(v - 500) <= 40, med
