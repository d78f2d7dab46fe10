"""As-of join semantics (inclusive backward match, tolerance, left
nulls) and the J1 positional zip-join emulation."""

from __future__ import annotations

import datetime as dt

from stonkwhisperer_spark.operators.asof import asof_join, zip_join


def _t(m):
    return dt.datetime(2024, 1, 1, 9, m, 0)


def test_asof_backward_inclusive(spark):
    bars = spark.createDataFrame(
        [("A", _t(0), 10), ("A", _t(5), 11), ("B", _t(3), 12)],
        "k string, bar_ts timestamp, n long",
    )
    sent = spark.createDataFrame(
        [("A", _t(0), 0.1), ("A", _t(4), 0.4)], "k string, ts timestamp, score double"
    )
    out = {
        (r.k, r.bar_ts.minute): r.score
        for r in asof_join(bars, sent, ["k"], "bar_ts", "ts", ["score"]).collect()
    }
    assert out[("A", 0)] == 0.1  # inclusive: equal timestamps match
    assert out[("A", 5)] == 0.4  # latest at-or-before
    assert out[("B", 3)] is None  # no right rows for key -> left-join null


def test_asof_tolerance(spark):
    bars = spark.createDataFrame([("A", _t(30), 1)], "k string, bar_ts timestamp, n long")
    sent = spark.createDataFrame([("A", _t(0), 0.9)], "k string, ts timestamp, score double")
    no_tol = asof_join(bars, sent, ["k"], "bar_ts", "ts", ["score"]).collect()[0]
    assert no_tol.score == 0.9
    with_tol = asof_join(
        bars, sent, ["k"], "bar_ts", "ts", ["score"], tolerance="15 minutes"
    ).collect()[0]
    assert with_tol.score is None  # match older than tolerance nulled


def test_zip_join_positional(spark):
    posts = spark.createDataFrame([(3, "p3"), (1, "p1"), (2, "p2")], "pid long, post string")
    fetched = spark.createDataFrame(
        [(30, "f3"), (10, "f1"), (20, "f2")], "fid long, content string"
    )
    out = {r.post: r.content for r in zip_join(posts, fetched, "pid", "fid").collect()}
    # i-th by pid pairs with i-th by fid (reference extraction.py:178-179)
    assert out == {"p1": "f1", "p2": "f2", "p3": "f3"}


def test_asof_forward_inclusive_and_tolerance(spark):
    bars = spark.createDataFrame(
        [("A", _t(0), 1), ("A", _t(5), 2), ("A", _t(40), 3), ("B", _t(3), 4)],
        "k string, bar_ts timestamp, n long",
    )
    sent = spark.createDataFrame(
        [("A", _t(0), 0.1), ("A", _t(7), 0.2)], "k string, ts timestamp, score double"
    )
    out = {
        (r.k, r.bar_ts.minute): r.score
        for r in asof_join(
            bars, sent, ["k"], "bar_ts", "ts", ["score"], direction="forward"
        ).collect()
    }
    assert out[("A", 0)] == 0.1   # inclusive: equal timestamps match
    assert out[("A", 5)] == 0.2   # earliest at-or-after
    assert out[("A", 40)] is None  # nothing ahead
    assert out[("B", 3)] is None   # no right rows for key

    with_tol = {
        (r.k, r.bar_ts.minute): r.score
        for r in asof_join(
            bars, sent, ["k"], "bar_ts", "ts", ["score"],
            direction="forward", tolerance="1 minute",
        ).collect()
    }
    assert with_tol[("A", 0)] == 0.1
    assert with_tol[("A", 5)] is None  # next match is 2 min ahead > tolerance
