"""HTML→text extraction (operators/html.py): behavioral fixtures +
cross-engine parity (the Spark pipeline vs its DuckDB SQL twin must be
byte-identical — the curation_html_extract oracle depends on it)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from mission_data_pipeline_spark.operators.html import (
    duckdb_extract_sql,
    extract_html_text,
)

CASES = {
    "basic": (
        "<html><head><title>T</title><style>p{c}</style></head><body>"
        "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
        "<p>The quick brown fox jumps over the lazy dog today.</p>"
        "<footer><a href='/t'>Terms &amp; conditions apply here always"
        "</a></footer></body></html>"
    ),
    "table": (
        "<table><tr><th>k</th><th>v</th></tr><tr>"
        "<td>alpha beta gamma delta epsilon zeta</td><td>2</td></tr></table>"
    ),
    "entities": (
        "<p>Tom &amp; Jerry say &quot;hello&quot; &lt;tag&gt; "
        "&#39;quoted&#39; and more words here</p>"
    ),
    "double_encoded": "<p>literal &amp;lt; stays encoded once with words around it</p>",
    "malformed": (
        "<p>unclosed <b>bold text runs on with many words here"
        "<p>another paragraph with plenty of words to keep going"
    ),
    "script_unclosed": (
        "<script>var x=1; this script never closes "
        "<p>visible words should still appear here though"
    ),
    "comment": "<p>kept words around a comment <!-- dropped --> stay here fine</p>",
    "nbsp": "line one&nbsp;two three four five six seven",
    "empty": "",
    "whitespace_only": "  \n\t  ",
    "anchor_heavy": (
        "<p><a href='x'>one two three four five six seven eight</a> t</p>"
    ),
    "anchor_some": (
        "<p>plain words around <a href='x'>tiny link</a> fill this "
        "line with enough words to pass easily</p>"
    ),
    "anchor_spanning_blocks": (
        "<p><a href='x'>the anchor opens here with several words"
        "<div>and keeps going in a second block before it finally "
        "closes</div></a></p>"
    ),
    "mixed_case_tags": (
        "<P>Upper case paragraph tags must still split and strip "
        "correctly</P><BR><DIV>second chunk of words long enough to "
        "survive the gate</DIV>"
    ),
    "short_lines_dropped": "<p>too short</p><p>also tiny</p>",
}


@pytest.fixture(scope="module")
def extracted(spark):
    df = spark.createDataFrame(
        [(k, v) for k, v in CASES.items()] + [("nullcase", None)],
        "name string, html string",
    )
    out = extract_html_text(df, "html", out_col="etext", diagnostics=True)
    return {
        r["name"]: (r["etext"], r["n_lines_kept"], r["n_lines_total"])
        for r in out.collect()
    }


def test_cross_engine_parity(extracted):
    names = list(CASES) + ["nullcase"]
    vals = [(n, CASES.get(n)) for n in names]
    p = duckdb_extract_sql("html")
    sql = f"""
    WITH src AS (SELECT * FROM (VALUES {",".join("(?, ?)" for _ in vals)})
                 AS t(name, html)),
    st AS (SELECT name, {p["structs"]} AS s FROM src)
    SELECT name, {p["text"].format(col="s")},
           {p["n_lines_kept"].format(col="s")},
           {p["n_lines_total"].format(col="s")}
    FROM st
    """
    duck = {
        r[0]: (r[1], r[2], r[3])
        for r in duckdb.connect()
        .execute(sql, [x for pair in vals for x in pair])
        .fetchall()
    }
    for n in names:
        assert extracted[n] == duck[n], (n, extracted[n], duck[n])


def test_boilerplate_dropped_content_kept(extracted):
    text, kept, total = extracted["basic"]
    assert text == "The quick brown fox jumps over the lazy dog today."
    assert kept == 1 and total == 3  # nav + content + footer candidates


def test_table_cells_flattened_per_row(extracted):
    assert extracted["table"][0] == "alpha beta gamma delta epsilon zeta 2"


def test_entities_decoded_bounded_set(extracted):
    assert (
        extracted["entities"][0]
        == 'Tom & Jerry say "hello" <tag> \'quoted\' and more words here'
    )
    # &amp; decoded LAST: double-encoded &amp;lt; yields literal &lt;
    assert "&lt;" in extracted["double_encoded"][0]


def test_malformed_markup_survives(extracted):
    assert extracted["malformed"] == (
        "unclosed bold text runs on with many words here\n"
        "another paragraph with plenty of words to keep going",
        2,
        2,
    )
    # unclosed <script> can't be container-stripped; its text faces the
    # line gates like any other (documented behavior, both engines)
    assert "visible words should still appear" in extracted["script_unclosed"][0]


def test_link_density_gate(extracted):
    assert extracted["anchor_heavy"][0] == ""  # all-link line dropped
    assert extracted["anchor_some"][1] == 1  # small link inside prose kept
    # an anchor spanning block boundaries contributes no density
    # (sentinel pair never matches within one line) — lines keep
    assert extracted["anchor_spanning_blocks"][1] >= 1


def test_min_words_and_empties(extracted):
    assert extracted["short_lines_dropped"] == ("", 0, 2)
    assert extracted["empty"] == ("", 0, 0)
    assert extracted["whitespace_only"] == ("", 0, 0)
    assert extracted["nullcase"] == (None, None, None)
    assert extracted["mixed_case_tags"][1] == 2


def test_no_python_udf_in_plan(spark):
    """The extractor must stay JVM-side (scale contract): no
    BatchEvalPython / ArrowEvalPython nodes in the executed plan."""
    df = spark.createDataFrame([("<p>a b c d e f</p>",)], "html string")
    out = extract_html_text(df, "html", out_col="t")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
