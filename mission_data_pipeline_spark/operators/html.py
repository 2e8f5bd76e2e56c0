"""HTML → text extraction with boilerplate removal (jusText-lite).

Completes the WARC crawl path (``sources/warc.py warc_to_documents``
raw-decodes payloads, so on real crawl data every downstream gate —
Gopher rules, dedup, LM scores — would see markup; VERDICT r10 item 1).

The rule set is DETERMINISTIC and SQL-REPLAYABLE: one shared pattern
table drives both the Spark Column pipeline (all JVM built-ins — zero
Python UDFs in the hot path) and a DuckDB SQL twin
(:func:`duckdb_extract_sql`), written in the Java∩RE2 regex subset
(inline ``(?is)`` flags, no backrefs, no lookaround, longest-first
alternations so backtracking vs automaton engines agree).

Pipeline (documented spec — every step identical in both engines):

1. strip ``<!-- -->`` comments;
2. drop container elements WITH their content (script/style/noscript/
   template/head/svg); an unclosed container is left in place (no
   regex match) — its text then faces the line gates like any other;
3. mark anchor text with sentinel chars (``\\x01``/``\\x02``) so link
   density survives tag stripping; an anchor spanning a block boundary
   contributes no density to either fragment (sentinels end up in
   different lines, the pair never matches) — deterministic both ways;
4. table cells → tab, block-tag boundaries (p/div/li/tr/h1-6/...) →
   newline, remaining tags → empty;
5. decode the bounded entity set (&nbsp; &lt; &gt; &quot; &#39;
   &apos;, then &amp; LAST — standard order so ``&amp;lt;`` yields the
   literal text ``&lt;``);
6. per line: collapse whitespace runs, trim, count words and
   linked (anchor-sentinel-wrapped) characters;
7. keep a line iff it is non-empty, has >= ``min_words`` words, and
   linked chars <= ``max_link_density`` * visible length (the jusText
   link-density gate; Kohlschütter-style line classification without
   the context-smoothing pass);
8. rejoin kept lines with newlines.

Reference parity: the reference pipeline has no HTML stage at all
(its ingest is telemetry binary, reference src/ has no HTML handling);
this operator extends the engine for the crawl-ingest story the same
way X1–X6 extend dedup/ANN/text.

Scale shape: pure per-row JVM expressions (regexp chains + one
higher-order line pass staged as its own projection so CollapseProject
cannot duplicate it) — zero shuffles, zero Python, embarrassingly
parallel over any partitioning at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "extract_html_text",
    "html_line_structs",
    "duckdb_extract_sql",
    "MIN_WORDS_DEFAULT",
    "MAX_LINK_DENSITY_DEFAULT",
]

MIN_WORDS_DEFAULT = 5
MAX_LINK_DENSITY_DEFAULT = 0.33

#: elements removed WITH their content
_CONTAINERS = ("script", "style", "noscript", "template", "head", "svg")

#: longest-first inside each prefix family (pre before p, tbody/thead/
#: tfoot/table before tr, header/footer before h[1-6] is irrelevant —
#: distinct first letters — but keep everything longest-first anyway)
_BLOCK_TAGS = (
    "blockquote|figcaption|textarea|article|section|header|footer|"
    "figure|select|option|thead|tbody|tfoot|table|title|aside|main|"
    "form|body|html|nav|pre|div|h[1-6]|hr|tr|ul|ol|li|dl|dt|dd|br|p"
)

_COMMENT_PAT = "(?s)<!--.*?-->"
_A_OPEN_PAT = r"(?is)<a\b[^>]*>"
_A_CLOSE_PAT = r"(?is)</a\s*>"
_CELL_PAT = r"(?is)</?(?:td|th)\b[^>]*>"
_BLOCK_PAT = rf"(?is)</?(?:{_BLOCK_TAGS})\b[^>]*>"
_TAG_PAT = "(?s)<[^>]*>"
_WS_PAT = r"\s+"
_SENTINEL_CLASS = "[\x01\x02]"
_LINK_PAT = "\x01[^\x02]*\x02"

#: decode order matters: &amp; LAST
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def _container_pat(tag: str) -> str:
    return rf"(?is)<{tag}\b[^>]*>.*?</{tag}\s*>"


def _cleaned(col: Column) -> Column:
    """Steps 1–5: markup → sentinel-marked, entity-decoded line text."""
    c = F.regexp_replace(col, _COMMENT_PAT, "")
    for tag in _CONTAINERS:
        c = F.regexp_replace(c, _container_pat(tag), "")
    c = F.regexp_replace(c, _A_OPEN_PAT, "\x01")
    c = F.regexp_replace(c, _A_CLOSE_PAT, "\x02")
    c = F.regexp_replace(c, _CELL_PAT, "\t")
    c = F.regexp_replace(c, _BLOCK_PAT, "\n")
    c = F.regexp_replace(c, _TAG_PAT, "")
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return c


def html_line_structs(col: Column) -> Column:
    """Steps 6: array<struct<t: visible line text, lk: linked chars>>.

    Stage THIS as its own projection (``.withColumn``) before deriving
    kept text / counts from it — CollapseProject will then keep the
    expensive regexp work single-evaluated instead of inlining it into
    every consumer.
    """
    lines = F.split(_cleaned(col), "\n")
    return F.transform(
        lines,
        lambda line: F.struct(
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(line, _SENTINEL_CLASS, ""),
                    _WS_PAT,
                    " ",
                )
            ).alias("t"),
            F.aggregate(
                F.regexp_extract_all(line, F.lit(_LINK_PAT), F.lit(0)),
                F.lit(0),
                lambda acc, m: acc + F.length(m) - F.lit(2),
            ).alias("lk"),
        ),
    )


def _keep(s: Column, min_words: int, max_link_density: float) -> Column:
    return (
        (s["t"] != F.lit(""))
        & (F.size(F.split(s["t"], " ")) >= F.lit(min_words))
        & (
            s["lk"].cast("double")
            <= F.lit(float(max_link_density)) * F.length(s["t"]).cast("double")
        )
    )


def extract_html_text(
    df: DataFrame,
    html_col: str = "text",
    *,
    out_col: str = "text",
    min_words: int = MIN_WORDS_DEFAULT,
    max_link_density: float = MAX_LINK_DENSITY_DEFAULT,
    diagnostics: bool = False,
) -> DataFrame:
    """Replace ``html_col`` markup with extracted main text in
    ``out_col``; with ``diagnostics=True`` also add ``n_lines_kept`` /
    ``n_lines_total`` (non-blank candidate lines, both BIGINT)."""
    staged = df.withColumn("__html_lines", html_line_structs(F.col(html_col)))
    kept = F.filter(
        F.col("__html_lines"),
        lambda s: _keep(s, min_words, max_link_density),
    )
    out = staged.withColumn("__kept", kept).withColumn(
        out_col, F.array_join(F.transform(F.col("__kept"), lambda s: s["t"]), "\n")
    )
    if diagnostics:
        out = out.withColumn(
            "n_lines_kept", F.size("__kept").cast("long")
        ).withColumn(
            "n_lines_total",
            F.size(
                F.filter(F.col("__html_lines"), lambda s: s["t"] != F.lit(""))
            ).cast("long"),
        )
    return out.drop("__html_lines", "__kept")


# ---------------------------------------------------------------------------
# DuckDB twin (oracle replay)
# ---------------------------------------------------------------------------


def _sql_str(s: str) -> str:
    """SQL string literal; control chars rendered as chr(n) concats so
    the emitted SQL stays printable/JSON-safe."""
    out = "'" + s.replace("'", "''") + "'"
    for ch in ("\x01", "\x02", "\t", "\n"):
        out = out.replace(ch, f"' || chr({ord(ch)}) || '")
    return out


def duckdb_cleaned_sql(expr: str) -> str:
    """DuckDB expression replaying :func:`_cleaned` on ``expr``."""
    c = f"regexp_replace({expr}, {_sql_str(_COMMENT_PAT)}, '', 'g')"
    for tag in _CONTAINERS:
        c = f"regexp_replace({c}, {_sql_str(_container_pat(tag))}, '', 'g')"
    c = f"regexp_replace({c}, {_sql_str(_A_OPEN_PAT)}, chr(1), 'g')"
    c = f"regexp_replace({c}, {_sql_str(_A_CLOSE_PAT)}, chr(2), 'g')"
    c = f"regexp_replace({c}, {_sql_str(_CELL_PAT)}, chr(9), 'g')"
    c = f"regexp_replace({c}, {_sql_str(_BLOCK_PAT)}, chr(10), 'g')"
    c = f"regexp_replace({c}, {_sql_str(_TAG_PAT)}, '', 'g')"
    for ent, rep in _ENTITIES:
        c = f"replace({c}, {_sql_str(ent)}, {_sql_str(rep)})"
    return c


def duckdb_structs_sql(cleaned_expr: str) -> str:
    """DuckDB expression replaying :func:`html_line_structs` on an
    already-cleaned expression. ``list_sum([])`` is NULL in DuckDB where
    Spark's aggregate seed gives 0 — hence the coalesce."""
    return (
        f"list_transform(string_split({cleaned_expr}, chr(10)), "
        "l -> struct_pack("
        f"t := trim(regexp_replace(regexp_replace(l, {_sql_str(_SENTINEL_CLASS)}, '', 'g'), "
        f"{_sql_str(_WS_PAT)}, ' ', 'g')), "
        f"lk := coalesce(list_sum(list_transform(regexp_extract_all(l, {_sql_str(_LINK_PAT)}), "
        "m -> length(m) - 2)), 0)))"
    )


def duckdb_keep_sql(
    var: str = "s",
    *,
    min_words: int = MIN_WORDS_DEFAULT,
    max_link_density: float = MAX_LINK_DENSITY_DEFAULT,
) -> str:
    """DuckDB lambda-body predicate replaying :func:`_keep`."""
    return (
        f"{var}.t <> '' AND len(string_split({var}.t, ' ')) >= {min_words} "
        f"AND CAST({var}.lk AS DOUBLE) <= {max_link_density!r} * length({var}.t)"
    )


def duckdb_extract_sql(
    expr: str,
    *,
    min_words: int = MIN_WORDS_DEFAULT,
    max_link_density: float = MAX_LINK_DENSITY_DEFAULT,
) -> dict[str, str]:
    """Full DuckDB replay of :func:`extract_html_text` over a SQL
    expression: returns the pieces an oracle composes —
    ``structs`` (bind it in a CTE as e.g. ``s``), and ``text`` /
    ``n_lines_kept`` / ``n_lines_total`` over a bound column ``{col}``
    (format with the CTE column name)."""
    keep = duckdb_keep_sql(
        "x", min_words=min_words, max_link_density=max_link_density
    )
    return {
        "structs": duckdb_structs_sql(duckdb_cleaned_sql(expr)),
        # DuckDB array_to_string([]) is NULL where Spark array_join([])
        # is '' — coalesce, but only for non-NULL input (NULL html must
        # stay NULL in both engines).
        "text": (
            "CASE WHEN {col} IS NULL THEN NULL ELSE "
            "coalesce(array_to_string(list_transform(list_filter({col}, "
            f"x -> {keep}), x -> x.t), chr(10)), '') END"
        ),
        "n_lines_kept": (
            f"CAST(len(list_filter({{col}}, x -> {keep})) AS BIGINT)"
        ),
        "n_lines_total": (
            "CAST(len(list_filter({col}, x -> x.t <> '')) AS BIGINT)"
        ),
    }
