"""k-anonymity audit semantics on a hand-built table."""

from __future__ import annotations

from realparse_spark.operators.privacy import k_anonymity
from realparse_spark.plans import explain as X


def test_k_anonymity_hand_values(spark):
    rows = [
        ("US", "A"), ("US", "A"), ("US", "A"),  # class of 3
        ("US", "B"),                              # singleton
        ("DE", "A"), ("DE", "A"),                 # class of 2
        ("DE", "B"), ("DE", "B"),                 # class of 2
    ]
    df = spark.createDataFrame(rows, ["nation", "seg"])
    out = {r["class_size_bucket"]: r for r in k_anonymity(df, ["nation", "seg"], k=3).collect()}
    assert out[1]["n_classes"] == 1 and out[1]["n_rows"] == 1 and out[1]["at_risk"]
    assert out[2]["n_classes"] == 2 and out[2]["n_rows"] == 4 and out[2]["at_risk"]
    assert out[3]["n_classes"] == 1 and out[3]["n_rows"] == 3 and not out[3]["at_risk"]
    # total row accounting is exact
    assert sum(r["n_rows"] for r in out.values()) == len(rows)


def test_k_anonymity_fully_anonymous(spark):
    df = spark.createDataFrame([("x",)] * 10, ["q"])
    rows = k_anonymity(df, ["q"], k=5).collect()
    assert len(rows) == 1 and not rows[0]["at_risk"]


def test_k_anonymity_query_jvm_side(spark, sf_dir):
    from realparse_spark.registry import all_queries

    df = all_queries()["k_anonymity"](spark, sf_dir)
    assert X.python_eval_nodes(df) == 0
    assert "CartesianProduct" not in X.executed_plan(df)


def test_t_closeness_flags_the_skewed_class(spark):
    """EMD behavior on planted distributions: a class drawn identically
    to the global distribution has emd_ppm = 0; a class concentrated
    entirely in one extreme bucket is flagged at t = 0.2; EMD stays in
    [0, 1e6]."""
    from realparse_spark.operators.privacy import t_closeness

    rows = []
    # global backdrop: quasi class ('a', seg) x buckets 0..4 uniformly
    i = 0
    for seg in ("A", "B", "C"):
        for bucket in range(5):
            for _ in range(4):
                rows.append((i, "a", seg, bucket)); i += 1
    # the skewed class: everything in the TOP bucket
    for _ in range(20):
        rows.append((i, "a", "SKEW", 4)); i += 1
    df = spark.createDataFrame(rows, "id long, nat string, seg string, sb int")
    out = {r.seg: r for r in t_closeness(df, ["nat", "seg"], "sb").collect()}
    # uniform classes vs a global that includes the skew: small EMD, not flagged
    for seg in ("A", "B", "C"):
        assert not out[seg].at_risk, out[seg]
        assert 0 <= out[seg].emd_ppm <= 1_000_000
    # the concentrated class is far from the global mix
    assert out["SKEW"].at_risk
    assert out["SKEW"].emd_ppm > out["A"].emd_ppm
