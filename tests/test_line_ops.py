"""Semantic gate for the line-level corpus operators (operators/text.py
`line_quality_filter`, `paragraph_dedup`, `lines_from_tokens`). The
catalog parity tests pin these against DuckDB on the fixtures; here we
pin the semantics on hand-checkable documents with real newlines.
"""

from __future__ import annotations

from cultural_heritage_bigdata_project_spark.operators import text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_quality_filter_rules(spark):
    docs = _docs(
        spark,
        [
            (0, "one two three\nshorty\nhas the javascript word here\nfour five six seven"),
            (1, "all of lorem ipsum boilerplate\ngood line three words"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in text.line_quality_filter(docs, min_words=3).collect()
    }
    # doc 0: 'shorty' (1 word) and the javascript line are dropped
    assert out[0]["n_lines"] == 4
    assert out[0]["n_lines_kept"] == 2
    assert out[0]["text_clean"] == "one two three\nfour five six seven"
    # doc 1: lorem ipsum line dropped
    assert out[1]["text_clean"] == "good line three words"


def test_line_quality_filter_terminal_punct_and_blank(spark):
    docs = _docs(spark, [(0, 'keep this line.\n\nno punct here\nquoted end ok"')])
    row = text.line_quality_filter(
        docs, min_words=2, require_terminal_punct=True
    ).collect()[0]
    # blank line: 0 words -> dropped by min_words; unpunctuated dropped
    assert row["n_lines"] == 4
    assert row["text_clean"] == 'keep this line.\nquoted end ok"'


def test_line_quality_filter_all_dropped_yields_empty(spark):
    docs = _docs(spark, [(0, "x\ny")])
    row = text.line_quality_filter(docs, min_words=2).collect()[0]
    assert row["n_lines_kept"] == 0 and row["text_clean"] == ""


def test_paragraph_dedup_keeps_first_holder_only(spark):
    boiler = "subscribe to our newsletter"
    docs = _docs(
        spark,
        [
            (5, f"unique five\n{boiler}"),
            (2, f"{boiler}\nunique two"),
            (9, f"{boiler}\nunique nine\n{boiler}"),
        ],
    )
    out = {r["doc_id"]: r for r in text.paragraph_dedup(docs).collect()}
    # min doc_id holding the boilerplate is 2 -> only doc 2 keeps it
    assert out[2]["text_clean"] == f"{boiler}\nunique two"
    assert out[5]["text_clean"] == "unique five"
    # doc 9: BOTH copies drop (line lives only in its min-id holder);
    # within-doc repeats of a foreign line are still duplicates
    assert out[9]["text_clean"] == "unique nine"
    assert out[9]["n_lines"] == 3 and out[9]["n_lines_kept"] == 1


def test_paragraph_dedup_normalizes_case_and_space(spark):
    docs = _docs(spark, [(1, "Hello World"), (2, "  hello world  ")])
    out = {r["doc_id"]: r for r in text.paragraph_dedup(docs).collect()}
    assert out[1]["n_lines_kept"] == 1
    assert out[2]["n_lines_kept"] == 0 and out[2]["text_clean"] == ""


def test_paragraph_dedup_blank_lines_structural(spark):
    docs = _docs(spark, [(1, "a a a\n\nb b b"), (2, "c c c\n\nd d d")])
    out = {r["doc_id"]: r for r in text.paragraph_dedup(docs).collect()}
    # the blank line survives in BOTH docs (never deduplicated)
    assert out[1]["text_clean"] == "a a a\n\nb b b"
    assert out[2]["text_clean"] == "c c c\n\nd d d"


def test_lines_from_tokens_chunks_and_roundtrip(spark):
    docs = _docs(spark, [(0, "a b c d e f g"), (1, "x")])
    out = {r["doc_id"]: r["text"] for r in text.lines_from_tokens(docs).collect()}
    assert out[0] == "a b c d e\nf g"
    assert out[1] == "x"
