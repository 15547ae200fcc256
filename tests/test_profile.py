"""table_profile: one-pass stats vs hand-computed values."""

from summingbird_spark.functions.profile import table_profile


def test_table_profile_hand_computed(spark):
    rows = [
        (1, "a", 1.5),
        (2, "a", None),
        (3, None, 2.5),
        (4, "b", 2.5),
    ]
    df = spark.createDataFrame(rows, "id long, s string, v double")
    got = {r["column"]: r.asDict() for r in table_profile(df).collect()}
    assert set(got) == {"id", "s", "v"}
    assert got["id"]["n_rows"] == 4 and got["id"]["n_null"] == 0
    assert got["id"]["n_distinct"] == 4
    assert (got["id"]["min_value"], got["id"]["max_value"]) == ("1", "4")
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 2
    assert (got["s"]["min_value"], got["s"]["max_value"]) == ("a", "b")
    assert got["v"]["n_null"] == 1 and got["v"]["n_distinct"] == 2
    assert got["v"]["min_value"] == "1.5"


def test_table_profile_single_job_and_approx(spark):
    df = spark.range(1000).selectExpr("id", "id % 7 as k")
    exact = {r["column"]: r["n_distinct"] for r in table_profile(df).collect()}
    approx = {
        r["column"]: r["n_distinct"]
        for r in table_profile(df, approx=True).collect()
    }
    assert exact == {"id": 1000, "k": 7}
    assert abs(approx["id"] - 1000) <= 50 and approx["k"] == 7
    # complex columns are skipped by default
    df2 = df.selectExpr("id", "array(id) as arr")
    assert {r["column"] for r in table_profile(df2).collect()} == {"id"}


def test_table_profile_hostile_column_names(spark):
    """Names containing backticks/quotes/dots are legal DataFrame columns;
    the profile must not feed them through SQL-string parsing (ADVICE r5)."""
    df = spark.createDataFrame(
        [(1, "x", 5), (2, None, 6)], ["a`b", "c'd", "e.f"]
    )
    got = {r["column"]: r for r in table_profile(df).collect()}
    assert set(got) == {"a`b", "c'd", "e.f"}
    assert got["a`b"]["n_distinct"] == 2
    assert got["c'd"]["n_null"] == 1
    assert (got["e.f"]["min_value"], got["e.f"]["max_value"]) == ("5", "6")
