"""Curation funnel — stage monotonicity and hand-checkable fixtures."""

from pyspark.sql import functions as F

from incubator_hugegraph_computer_spark.functions.curation import curation_funnel


def _docs(spark):
    good = ("the quick brown fox jumps over the lazy dog and runs on "
            "to the hills for a while with great joy in the morning")
    rows = [
        (0, good, "en", "web", len(good)),
        (1, good, "en", "web", len(good)),          # exact dup of 0
        (2, "x" * 30, "en", "web", 30),             # low quality (no stopwords)
        (3, good + " extra tail tokens here", "en", "web", len(good) + 24),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_funnel_monotone_and_dedup(spark):
    out = {r["stage"]: (r["n_docs"], r["n_tokens"])
           for r in curation_funnel(_docs(spark), eval_rate=0.0).collect()}
    assert out["raw"][0] == 4
    assert out["exact_dedup"][0] == 3          # doc 1 collapsed into 0
    assert out["quality"][0] == 2              # doc 2 dropped
    assert out["holdout"] == out["quality"]    # eval_rate 0 -> no holdout
    assert out["decontaminated"] == out["holdout"]  # no eval set -> nothing flagged
    # counts never increase along the funnel
    order = ["raw", "exact_dedup", "quality", "holdout", "decontaminated"]
    docs_seq = [out[s][0] for s in order]
    toks_seq = [out[s][1] for s in order]
    assert docs_seq == sorted(docs_seq, reverse=True)
    assert toks_seq == sorted(toks_seq, reverse=True)


def test_funnel_decontaminates_eval_overlap(spark):
    # with a high eval rate some docs land in the eval split; any
    # surviving doc sharing a 3-shingle with an eval doc must be dropped
    docs = _docs(spark)
    rows = curation_funnel(docs, eval_rate=0.9).collect()
    out = {r["stage"]: r["n_docs"] for r in rows}
    assert out["decontaminated"] <= out["holdout"] <= out["quality"]
