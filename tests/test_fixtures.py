"""The two transcript generator implementations (pandas oracle vs pure
Spark column expressions) must emit identical rows."""

from logboost_spark.fixtures import transcripts as TR


def test_generators_identical(spark):
    n = 5000
    pdf = TR.gen_pandas(n).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    sdf = (
        TR.gen_spark(spark, n)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert list(pdf.columns) == list(sdf.columns)
    for c in ["conv_id", "turn_idx", "role", "text", "tool"]:
        assert (pdf[c] == sdf[c]).all(), c
    assert (pdf["ts"].astype(str) == sdf["ts"].astype(str)).all()


def test_skew_exists():
    pdf = TR.gen_pandas(20000)
    sizes = pdf.groupby("conv_id").size().sort_values(ascending=False)
    # heavy tail: top-17 hot conversations hold ~20% of turns; the hot/median
    # ratio grows linearly with n (hot convs absorb a constant fraction while
    # cold convs stay ~40 turns), so at bench scale it is 100×+
    assert sizes.iloc[:17].sum() > 0.15 * len(pdf)
    assert sizes.iloc[0] > 5 * sizes.median()


def test_committed_fixture_stable():
    import pandas as pd

    p = TR.fixture_path("sf0.001")
    disk = pd.read_parquet(p)
    gen = TR.gen_pandas(TR.FIXTURE_SIZES["sf0.001"])
    assert (disk["text"] == gen["text"]).all()
    assert (disk["conv_id"] == gen["conv_id"]).all()
