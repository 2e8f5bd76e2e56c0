"""BM25 text relevance (operators/text.py)."""

import math

import pytest

from mission_data_pipeline_spark.operators.text import bm25_scores


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark spark spark query"),
        (2, "spark query join window table"),
        (3, "table window batch data row column value"),
        (4, "join join join join join join join join"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_golden(docs):
    out = {r["doc_id"]: r for r in bm25_scores(docs, ["spark", "join"]).collect()}
    assert set(out) == {1, 2, 4}  # doc 3 matches nothing
    assert out[1]["n_matched"] == 1 and out[2]["n_matched"] == 2

    # hand-computed reference: N=4, avgdl=(4+5+7+8)/4=6
    def ref(tf, dl, df, k1=1.2, b=0.75, n=4.0, avgdl=6.0):
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))

    assert out[1]["bm25"] == pytest.approx(ref(3, 4, 2), abs=1e-6)
    assert out[2]["bm25"] == pytest.approx(ref(1, 5, 2) + ref(1, 5, 2), abs=1e-6)
    assert out[4]["bm25"] == pytest.approx(ref(8, 8, 2), abs=1e-6)
    # tf saturation: 8x 'join' scores below idf*(k1+1) asymptote
    idf_join = math.log(1.0 + (4.0 - 2 + 0.5) / 2.5)
    assert out[4]["bm25"] < idf_join * 2.2


def test_bm25_empty_terms_rejected(docs):
    with pytest.raises(ValueError):
        bm25_scores(docs, [])


def test_scrub_text_redacts_pii(spark):
    from mission_data_pipeline_spark.operators.text import scrub_text

    rows = [
        (1, "contact bob.smith+x@example.co.uk or visit https://a.io/x?q=1 now"),
        (2, "call 555-123-4567 card 4111111111111111 ok"),
        (3, "clean text with numbers 42 and 2024 stays"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["text"] for r in scrub_text(df).collect()}
    assert got[1] == "contact <EMAIL> or visit <URL> now"
    assert got[2] == "call <PHONE> card <LONGNUM> ok"
    assert got[3] == rows[2][1]  # short numbers untouched
    # expression-only, no shuffle
    plan = scrub_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
