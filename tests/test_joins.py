"""Unit tests for the temporal join operators (as-of, range, sessionize)."""

from __future__ import annotations

from datetime import datetime as TS

from data_engineering_task_adtech_data_pipeline_spark.operators.joins import (
    asof_join,
    range_join,
    sessionize,
)


def test_asof_join_basic_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, 10, TS(2024, 1, 1, 12)), (2, 10, TS(2024, 1, 1, 9)),
         (3, 20, TS(2024, 1, 1, 12))],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, TS(2024, 1, 1, 10), 100.0), (10, TS(2024, 1, 1, 11), 200.0)],
        "k long, rts timestamp, px double",
    )
    out = {
        r.event_id: r
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            right_payload=["px"],
        ).collect()
    }
    assert out[1].px_asof == 200.0  # latest at-or-before 12:00
    assert out[2].px_asof is None  # 9:00 predates all right rows
    assert out[3].px_asof is None  # key 20 has no right rows
    assert len(out) == 3  # left row count preserved


def test_asof_join_tie_matches(spark):
    left = spark.createDataFrame(
        [(1, 1, TS(2024, 1, 1, 10))], "event_id long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 10), 5.0)], "k long, rts timestamp, px double"
    )
    row = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts", right_payload=["px"]
    ).first()
    assert row.px_asof == 5.0  # right_ts == left_ts matches


def test_range_join_boundaries(spark):
    left = spark.createDataFrame(
        [(1, 1, TS(2024, 1, 1, 12, 0, 0))], "lid long, k long, lts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, 1, TS(2024, 1, 1, 12, 59, 59)),  # inside
            (11, 1, TS(2024, 1, 1, 13, 0, 0)),    # exactly at tolerance
            (12, 1, TS(2024, 1, 1, 13, 0, 1)),    # outside
            (13, 1, TS(2024, 1, 1, 11, 0, 0)),    # exactly at -tolerance
            (14, 2, TS(2024, 1, 1, 12, 0, 0)),    # other key
        ],
        "rid long, k long, rts timestamp",
    )
    out = {
        r.rid
        for r in range_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            tolerance_seconds=3600,
        ).collect()
    }
    assert out == {10, 11, 13}


def test_sessionize_gaps(spark):
    ev = spark.createDataFrame(
        [
            (1, TS(2024, 1, 1, 10, 0)),
            (1, TS(2024, 1, 1, 10, 10)),   # same session (<=30min)
            (1, TS(2024, 1, 1, 11, 0)),    # new session (50min gap)
            (2, TS(2024, 1, 1, 10, 0)),    # separate key
        ],
        "user_id long, ts timestamp",
    )
    out = sessionize(ev, key=["user_id"], ts_col="ts", gap_seconds=1800)
    rows = {(r.user_id, r.session_id): r for r in out.collect()}
    assert len(rows) == 3
    assert rows[(1, 1)].n_events == 2
    assert rows[(1, 1)].session_end == TS(2024, 1, 1, 10, 10)
    assert rows[(1, 2)].n_events == 1
    assert rows[(2, 1)].n_events == 1
