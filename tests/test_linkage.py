"""Fellegi–Sunter scoring (`operators/linkage.py`): weight summation,
thresholds, and the clerical-review band."""

from pyspark.sql import functions as F

from etl_process_spark.operators.linkage import FieldWeight, fs_score


def test_scores_and_decisions(spark):
    rows = [
        # name_eq, size_eq -> expected score with weights (+200/-50, +300/-30)
        (1, True, True),    # 500 -> match
        (2, True, False),   # 170 -> possible
        (3, False, True),   # 250 -> possible
        (4, False, False),  # -80 -> nonmatch
    ]
    df = spark.createDataFrame(rows, "id int, name_eq boolean, size_eq boolean")
    out = fs_score(
        df,
        [
            FieldWeight("name", F.col("name_eq"), 200, -50),
            FieldWeight("size", F.col("size_eq"), 300, -30),
        ],
        match_at=500,
        possible_at=100,
    )
    got = {r["id"]: (r["score_cb"], r["decision"]) for r in out.collect()}
    assert got == {
        1: (500, "match"),
        2: (170, "possible"),
        3: (250, "possible"),
        4: (-80, "nonmatch"),
    }
