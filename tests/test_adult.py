"""Adult-content scoring (AdultCheck.cpp getAdultPoints semantics):
once-per-needle weighted sum, clean-word offsets, threshold bit."""

from open_source_search_engine_spark.training.adult import (
    ADULT_THRESHOLD, adult_points, adult_points_col, is_adult_col)


def test_points_once_per_needle_and_offsets():
    # repeated occurrences of one needle count ONCE (m_count<=0 gate,
    # AdultCheck.cpp:516-522)
    assert adult_points("porn porn porn") == 2
    # weights sum across distinct needles
    assert adult_points("porn and xxx site") == 4
    # clean-word offset: 'sussex' contains 'sex' (+1) but offsets (-1)
    assert adult_points("visiting sussex today") == 0
    assert adult_points("adultery is a legal term") == 1 - 1
    assert adult_points("completely clean text") == 0


def test_threshold_bit_and_catalyst_twin(spark):
    texts = ["porn hub", "sussex cricket", "escort service nude photos",
             "adult education", "xxx", "nothing here"]
    want_pts = [adult_points(t) for t in texts]
    want_bit = [p >= ADULT_THRESHOLD for p in want_pts]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["i", "text"])
    rows = (df.select("i", adult_points_col("text").alias("p"),
                      is_adult_col("text").alias("a"))
            .orderBy("i").collect())
    assert [r["p"] for r in rows] == want_pts
    assert [r["a"] for r in rows] == want_bit
    # spot semantics: 1-point terms alone stay below the bar
    assert want_bit == [True, False, True, False, True, False]
