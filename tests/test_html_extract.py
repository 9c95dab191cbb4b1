"""HTML -> text extraction: native/vectorized parity, entity decoding,
malformed-markup behavior, and plan shape (pure projection).

The registry query `html_text_extract` proves round-trip correctness vs
the DuckDB oracle; these tests cover what the oracle can't — the
vectorized twin's wider entity table, adversarial markup, and the
guarantee that the native path never leaves codegen.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.html_extract import (
    extract_html_text,
    extract_html_text_vectorized,
    html_to_text,
    synthesize_html_docs,
)


@pytest.fixture(scope="module")
def html_docs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return synthesize_html_docs(docs).select("doc_id", "html").persist()


def test_native_vectorized_parity(html_docs):
    cols = ["doc_id", "html_text", "html_title", "n_links"]
    nat = extract_html_text(html_docs).select(*cols)
    vec = extract_html_text_vectorized(html_docs).select(*cols)
    assert nat.exceptAll(vec).count() == 0
    assert vec.exceptAll(nat).count() == 0


def _one(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(html_to_text(F.col("html")).alias("t")).first().t


def _one_vec(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return extract_html_text_vectorized(df).first().html_text


def test_script_style_comment_dropped(spark):
    h = (
        "<p>keep</p><script>var a = 1 < 2; s='</div>';</script>"
        "<style>p { color: red }</style><!-- secret --><p>tail</p>"
    )
    assert _one(spark, h) == "keep\ntail"


def test_unterminated_script_swallows_tail(spark):
    # Conservative: an unclosed <script> drops to end-of-document rather
    # than leaking JS into the corpus.
    assert _one(spark, "<p>ok</p><script>var x = '") == "ok"


def test_inline_tags_strip_block_tags_break(spark):
    h = "<div>a <b>bold</b> word</div><div>second</div>"
    assert _one(spark, h) == "a bold word\nsecond"


def test_named_entities_native(spark):
    h = "<p>Tom &amp; Jerry &lt;3 &quot;cheese&quot; &mdash; &copy; now&hellip;</p>"
    assert _one(spark, h) == 'Tom & Jerry <3 "cheese" — © now…'


def test_double_escaped_entity_single_decode(spark):
    # &amp;lt; must decode to the literal text "&lt;", not "<".
    assert _one(spark, "<p>&amp;lt;tag&amp;gt;</p>") == "&lt;tag&gt;"
    assert _one_vec(spark, "<p>&amp;lt;tag&amp;gt;</p>") == "&lt;tag&gt;"


def test_numeric_and_exotic_entities_vectorized_only(spark):
    # The vectorized path carries Python's full entity table.
    assert _one_vec(spark, "<p>&#72;&#105; &#x21;</p>") == "Hi !"
    assert _one_vec(spark, "<p>&Uuml;ber</p>") == "Über"


def test_nbsp_normalizes_identically(spark):
    # &nbsp; -> plain space on BOTH paths (html.unescape yields U+00A0,
    # normalization folds it), so downstream tokenizers see one space.
    h = "<p>a&nbsp;&nbsp;b</p>"
    assert _one(spark, h) == "a b"
    assert _one_vec(spark, h) == "a b"


def test_stray_lt_left_as_text(spark):
    # "<" that never closes is not a tag; the tail must survive.
    assert _one(spark, "<p>1 < 2 is true</p>") == "1 < 2 is true"


def test_whitespace_normalization(spark):
    h = "<div>  a   b  </div><div></div><div>\t c </div>"
    assert _one(spark, h) == "a b\nc"


def test_plain_text_passthrough(spark):
    assert _one(spark, "no markup here") == "no markup here"


def test_link_count_and_title(spark, html_docs):
    out = extract_html_text(html_docs).select("doc_id", "html_title", "n_links")
    bad_title = out.filter(~F.col("html_title").rlike(r"^Doc \d+ — src\d+$")).count()
    assert bad_title == 0
    bad_links = out.filter(
        F.col("n_links")
        != F.when(F.pmod("doc_id", F.lit(3)) == 0, F.lit(3)).otherwise(F.lit(2))
    ).count()
    assert bad_links == 0


def test_native_plan_is_pure_projection(html_docs):
    # The extractor must stay a scan+project plan: no Exchange, no
    # Python/Arrow eval node in the native path.
    plan = extract_html_text(html_docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
