from symspellpy_spark.config import Verbosity
from symspellpy_spark.operators.dedup import select_matches


def test_select_matches_verbosity(spark):
    pairs = spark.createDataFrame(
        [
            ("a", "x", 0.9),
            ("a", "y", 0.9),
            ("a", "z", 0.5),
            ("b", "x", 0.7),
        ],
        "id_a string, id_b string, jaccard double",
    )
    top = select_matches(pairs, Verbosity.TOP).collect()
    got_top = {(r["id_a"], r["id_b"]) for r in top}
    assert got_top == {("a", "x"), ("b", "x")}

    closest = select_matches(pairs, Verbosity.CLOSEST).collect()
    got_closest = {(r["id_a"], r["id_b"]) for r in closest}
    assert got_closest == {("a", "x"), ("a", "y"), ("b", "x")}

    assert select_matches(pairs, Verbosity.ALL).count() == 4
