"""Expectations operator + PERMISSIVE corrupt-record capture."""

from pyspark.sql import functions as F

from institutional_fx_etl_spark.functions.expectations import check_expectations


def test_check_expectations_split(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, -5.0, "b"), (3, 7.0, None), (4, -1.0, None)],
        "id int, v double, tag string",
    )
    passing, violations = check_expectations(
        df,
        {
            "v_nonnegative": F.col("v") >= 0,
            "tag_present": F.col("tag").isNotNull(),
        },
    )
    assert sorted(r["id"] for r in passing.collect()) == [1]
    viol = sorted((r["id"], r["rule"]) for r in violations.collect())
    assert viol == [
        (2, "v_nonnegative"),
        (3, "tag_present"),
        (4, "tag_present"),
        (4, "v_nonnegative"),
    ]


def test_permissive_csv_captures_corrupt_records(spark, tmp_path):
    """S-family depth: PERMISSIVE mode keeps malformed lines in a
    corrupt-record column instead of dropping them silently — the
    forensic alternative to DROPMALFORMED when input quality matters."""
    p = tmp_path / "ticks.csv"
    p.write_text(
        "datetime,ask,bid\n"
        "2024-01-01 10:00:00,1.2,1.1\n"
        "not-a-date,oops,xx\n"
        "2024-01-01 10:01:00,1.3,1.2\n"
    )
    df = (
        spark.read.schema(
            "datetime timestamp, ask double, bid double, _corrupt_record string"
        )
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(p))
    )
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(good) == 2 and len(bad) == 1
    assert "not-a-date" in bad[0]["_corrupt_record"]
    assert bad[0]["ask"] is None  # unparseable cells null out
