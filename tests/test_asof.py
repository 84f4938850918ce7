"""As-of join: equivalence with a brute-force range-join reference on
randomized-ish data (including no-match rows, inclusive-equality ts,
duplicate right timestamps), direction and tolerance semantics, and the
single-exchange plan shape (no pair blow-up)."""

import contextlib
import datetime as dt
import io

import pytest
from pyspark.sql import functions as F

from gitnexus_spark.operators.asof import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


@pytest.fixture(scope="module")
def sides(spark):
    # left: queries at odd minutes; user 3 has no right rows at all
    left = spark.createDataFrame(
        [(i, u, _ts(m)) for i, (u, m) in enumerate(
            [(1, 5), (1, 10), (1, 0), (2, 7), (2, 30), (3, 9)])],
        "lid long, user long, ts timestamp")
    # right: states; user 1 has a duplicate-ts pair at minute 5
    right = spark.createDataFrame(
        [(100, 1, _ts(2), "a"), (101, 1, _ts(5), "b"), (102, 1, _ts(5), "c"),
         (103, 1, _ts(9), "d"), (104, 2, _ts(8), "e"), (105, 2, _ts(20), "f")],
        "rid long, user long, ts timestamp, val string")
    return left, right


def _brute(spark, left, right, direction="backward"):
    """Reference: range join + keep the extreme (ts, payload) per left row."""
    l, r = left.alias("l"), right.alias("r")
    cond = (F.col("l.user") == F.col("r.user"))
    cond &= (F.col("r.ts") <= F.col("l.ts")) if direction == "backward" \
        else (F.col("r.ts") >= F.col("l.ts"))
    pairs = l.join(r, cond, "left")
    key = F.struct(F.col("r.ts"), F.col("r.rid"), F.col("r.val"))
    agg = F.max(key) if direction == "backward" else F.min(key)
    return (pairs.groupBy("l.lid")
            .agg(agg.alias("m"))
            .select("lid", F.col("m.rid").alias("r_rid"),
                    F.col("m.val").alias("r_val")))


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_matches_brute_force(spark, sides, direction):
    left, right = sides
    got = {r["lid"]: (r["r_rid"], r["r_val"])
           for r in asof_join(left, right, ["user"],
                              direction=direction).collect()}
    want = {r["lid"]: (r["r_rid"], r["r_val"])
            for r in _brute(spark, left, right, direction).collect()}
    assert got == want
    assert len(got) == left.count()  # pure LEFT semantics, no row change


def test_specific_semantics(spark, sides):
    left, right = sides
    got = {r["lid"]: r for r in
           asof_join(left, right, ["user"]).collect()}
    # lid 0: user 1 @5 -> inclusive match at ts=5; dup ts resolves to
    # the greatest payload struct (rid 102)
    assert got[0]["r_rid"] == 102 and got[0]["r_val"] == "c"
    # lid 2: user 1 @0 -> nothing at or before -> NULLs
    assert got[2]["r_rid"] is None and got[2]["r_val"] is None
    # lid 5: user 3 has no right rows at all -> NULLs
    assert got[5]["r_rid"] is None


def test_tolerance(spark, sides):
    left, right = sides
    got = {r["lid"]: r["r_rid"] for r in
           asof_join(left, right, ["user"],
                     tolerance_s=120).collect()}
    # lid 1: user 1 @10, match @9 (60s) kept; lid 4: user 2 @30,
    # match @20 (600s) voided
    assert got[1] == 103
    assert got[4] is None


def test_single_exchange_plan(spark, sides):
    """The plan must contain NO join node (union + window only) and a
    single exchange on the key."""
    left, right = sides
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asof_join(left, right, ["user"]).explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan, plan
    body = plan.split("===== Subqueries =====")[0]
    n_exchanges = body.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, plan  # one per union branch pre-AQE at most


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_randomized_equivalence(spark, direction):
    """Seeded random instance: 60 keys, colliding timestamps, sparse
    keys on either side — must match brute force exactly."""
    import numpy as np
    rng = np.random.RandomState(7)
    left = spark.createDataFrame(
        [(int(i), int(rng.randint(0, 60)), _ts(int(rng.randint(0, 500))))
         for i in range(2000)], "lid long, user long, ts timestamp")
    right = spark.createDataFrame(
        [(int(1_000_000 + i), int(rng.randint(0, 50)),
          _ts(int(rng.randint(0, 500))), f"v{rng.randint(0, 9)}")
         for i in range(1500)], "rid long, user long, ts timestamp, val string")
    got = {r["lid"]: (r["r_rid"], r["r_val"])
           for r in asof_join(left, right, ["user"],
                              direction=direction).collect()}
    want = {r["lid"]: (r["r_rid"], r["r_val"])
            for r in _brute(spark, left, right, direction).collect()}
    assert got == want


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("bucket_s", [60, 300, 3600])
def test_bucketed_parity(spark, direction, bucket_s):
    """The (key, time-bucket) plan must return EXACTLY the plain plan's
    rows at every bucket width — including widths that leave empty
    buckets between a left row and its match (carry must skip them)."""
    import numpy as np
    rng = np.random.RandomState(11)
    left = spark.createDataFrame(
        [(int(i), int(rng.randint(0, 40)), _ts(int(rng.randint(0, 700))))
         for i in range(1500)], "lid long, user long, ts timestamp")
    right = spark.createDataFrame(
        [(int(1_000_000 + i), int(rng.randint(0, 30)),
          _ts(int(rng.randint(0, 700))), f"v{rng.randint(0, 9)}")
         for i in range(900)], "rid long, user long, ts timestamp, val string")
    plain = {r["lid"]: (r["r_rid"], r["r_val"])
             for r in asof_join(left, right, ["user"],
                                direction=direction).collect()}
    bucketed = {r["lid"]: (r["r_rid"], r["r_val"])
                for r in asof_join(left, right, ["user"],
                                   direction=direction,
                                   bucket_s=bucket_s).collect()}
    assert bucketed == plain


def test_bucketed_empty_gap_carry(spark):
    """A match many EMPTY buckets back must still carry forward."""
    left = spark.createDataFrame(
        [(1, 7, _ts(500))], "lid long, user long, ts timestamp")
    right = spark.createDataFrame(
        [(100, 7, _ts(1), "old")], "rid long, user long, ts timestamp, val string")
    out = asof_join(left, right, ["user"], bucket_s=60).collect()
    assert out[0]["r_rid"] == 100 and out[0]["r_val"] == "old"


def test_bucketed_plan_partitions_by_bucket(spark, sides):
    """Skew proof: the fact-level window must partition by
    (key, _bucket), so ONE hot key parallelizes across its time range —
    the only key-global window runs on the per-bucket summary."""
    left, right = sides
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asof_join(left, right, ["user"], bucket_s=600).explain("formatted")
    plan = buf.getvalue()
    assert "_bucket" in plan
    # the in-fact window sorts by (_ts, _side, _rv) and must carry
    # _bucket in its partition spec
    import re
    win_specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    fact_specs = [s for s in win_specs if "_side" in s]
    assert fact_specs, plan
    assert all("_bucket" in s for s in fact_specs), fact_specs


def test_numeric_epoch_tolerance(spark):
    """tolerance_s over a NUMERIC epoch-seconds ts column must use raw
    arithmetic (unix_timestamp would parse NULL and void every match)."""
    left = spark.createDataFrame(
        [(1, 5, 1000), (2, 5, 5000)], "lid long, user long, ts long")
    right = spark.createDataFrame(
        [(100, 5, 900, "x")], "rid long, user long, ts long, val string")
    got = {r["lid"]: r["r_rid"] for r in
           asof_join(left, right, ["user"], tolerance_s=200).collect()}
    assert got[1] == 100      # gap 100s kept
    assert got[2] is None     # gap 4100s voided
    # and bucketing over numeric ts works too
    got_b = {r["lid"]: r["r_rid"] for r in
             asof_join(left, right, ["user"], bucket_s=50).collect()}
    assert got_b[1] == 100 and got_b[2] == 100


def test_string_ts_tolerance_raises(spark):
    left = spark.createDataFrame([(1, 5, "2024-01-01")],
                                 "lid long, user long, ts string")
    right = spark.createDataFrame([(9, 5, "2024-01-01", "x")],
                                  "rid long, user long, ts string, val string")
    with pytest.raises(ValueError, match="timestamp or numeric"):
        asof_join(left, right, ["user"], tolerance_s=10).collect()
