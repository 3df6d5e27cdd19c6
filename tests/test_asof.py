"""As-of join semantics on hand-built data: inclusive ties, NULL for no
prior right row, per-key isolation."""

from __future__ import annotations

import datetime as dt

import pytest

from custom_python_vectordb_spark.operators.asof import asof_join_backward


def ts(sec: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, sec)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, ts(10), 100.0),  # matches right@5
            (1, ts(20), 200.0),  # matches right@20 (tie inclusive)
            (2, ts(10), 300.0),  # no prior right for key 2 until ts 15
            (2, ts(30), 400.0),  # matches right@15
        ],
        "user_id long, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [
            (1, ts(5), 51), (1, ts(20), 52), (1, ts(25), 53),
            (2, ts(15), 54),
        ],
        "user_id long, ts timestamp, view_id long",
    )
    return left, right


def test_backward_asof_semantics(frames):
    left, right = frames
    out = {
        (r["user_id"], r["ts"]): (r["asof_view_id"], r["asof_ts"])
        for r in asof_join_backward(left, right, key="user_id", right_cols=["view_id"]).collect()
    }
    assert out[(1, ts(10))][0] == 51          # latest right ≤ 10 is @5
    assert out[(1, ts(20))][0] == 52          # tie at equal ts is inclusive
    assert out[(2, ts(10))] == (None, None)   # no prior right row → NULLs
    assert out[(2, ts(30))][0] == 54          # keys never cross
    # right@25 for key 1 is in the future of every left row → never matched
    assert all(v[0] != 53 for v in out.values() if v[0] is not None)


def test_left_columns_preserved(frames):
    left, right = frames
    out = asof_join_backward(left, right, key="user_id", right_cols=["view_id"])
    assert set(out.columns) == {"user_id", "ts", "value", "asof_ts", "asof_view_id"}
    vals = {r["value"] for r in out.collect()}
    assert vals == {100.0, 200.0, 300.0, 400.0}
