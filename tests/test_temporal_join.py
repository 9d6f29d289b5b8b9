"""As-of and range join tests (pandas merge_asof parity for asof)."""

import datetime

import pandas as pd
import pytest
from pyspark.sql import Row

from odibi_spark.operators.temporal_join import asof_join_frames, range_join_frames


def ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            Row(sym="A", t=ts("2024-01-01 10:00:00"), px=100.0),
            Row(sym="A", t=ts("2024-01-01 10:05:00"), px=101.0),
            Row(sym="B", t=ts("2024-01-01 10:01:00"), px=50.0),
        ]
    )


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            Row(sym="A", t=ts("2024-01-01 10:03:00"), qty=10),
            Row(sym="A", t=ts("2024-01-01 10:05:00"), qty=5),   # tie with quote
            Row(sym="A", t=ts("2024-01-01 09:00:00"), qty=1),   # before any quote
            Row(sym="B", t=ts("2024-01-01 10:30:00"), qty=7),
        ]
    )


def test_asof_backward_matches_pandas(spark, trades, quotes):
    got = asof_join_frames(trades, quotes, on="t", by=["sym"]).toPandas()
    got = got.sort_values(["sym", "t"]).reset_index(drop=True)
    exp = pd.merge_asof(
        trades.toPandas().sort_values("t"),
        quotes.toPandas().sort_values("t").rename(columns={"px": "r_px", "t": "r_t"}),
        left_on="t", right_on="r_t", left_by="sym", right_by="sym",
    ).sort_values(["sym", "t"]).reset_index(drop=True)
    norm = lambda s: [None if pd.isna(v) else v for v in s]  # noqa: E731
    assert norm(got["r_px"]) == norm(exp["r_px"])
    # tie at 10:05 matches the simultaneous quote
    tie = got[(got.sym == "A") & (got.qty == 5)].iloc[0]
    assert tie.r_px == 101.0
    # trade before any quote -> NULL
    early = got[(got.sym == "A") & (got.qty == 1)].iloc[0]
    assert pd.isna(early.r_px)


def test_asof_tolerance(spark, trades, quotes):
    got = asof_join_frames(
        trades, quotes, on="t", by=["sym"], tolerance="2 MINUTES"
    ).toPandas()
    t3 = got[(got.sym == "A") & (got.qty == 10)].iloc[0]  # 10:03 vs quote 10:00
    assert pd.isna(t3.r_px)  # 3 min > 2 min tolerance
    tie = got[(got.sym == "A") & (got.qty == 5)].iloc[0]
    assert tie.r_px == 101.0


def test_asof_forward(spark, trades, quotes):
    got = asof_join_frames(
        trades, quotes, on="t", by=["sym"], direction="forward"
    ).toPandas()
    early = got[(got.sym == "A") & (got.qty == 1)].iloc[0]  # 09:00 -> next quote 10:00
    assert early.r_px == 100.0


def test_range_join_bucketed_equals_naive(spark):
    import random

    random.seed(7)
    points = spark.createDataFrame(
        [Row(k="a", x=float(random.randint(0, 1000))) for _ in range(300)]
    )
    intervals = spark.createDataFrame(
        [
            Row(k="a", lo=float(s), hi=float(s + random.randint(5, 120)), iv=i)
            for i, s in enumerate(random.sample(range(0, 1000), 40))
        ]
    )
    naive = range_join_frames(
        points, intervals, left_point="x", right_start="lo", right_end="hi",
        keys=["k"],
    )
    bucketed = range_join_frames(
        points, intervals, left_point="x", right_start="lo", right_end="hi",
        keys=["k"], bucket_width=50,
    )
    n_rows = naive.select("x", "iv").toPandas().sort_values(["x", "iv"]).values.tolist()
    b_rows = bucketed.select("x", "iv").toPandas().sort_values(["x", "iv"]).values.tolist()
    assert n_rows == b_rows and len(n_rows) > 0
