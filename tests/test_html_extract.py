"""t24 HTML main-content extraction (operators/html.py) — unit tests
for the integer jusText/Kohlschütter rules, plus the composed
WARC → extract → clean pipeline the round-9 verdict asked for (the
extractor is the missing step between s12's raw HTTP bodies and t6's
clean-prose expectations)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fhir_etl_spark.operators.html import extract_main_content


def _one(spark, html, **kw):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return extract_main_content(df, **kw).collect()[0]


CONTENT = "the quick brown fox jumps over the lazy dog again"  # 10 words


def test_script_style_comments_never_leak(spark):
    r = _one(
        spark,
        "<html><head><script>var leak_script = 1;</script>"
        "<style>.leak_style{}</style></head><body>"
        f"<!-- leak_comment --><p>{CONTENT}</p></body></html>",
    )
    assert r["main_text"] == CONTENT
    assert "leak" not in r["main_text"]
    assert r["n_kept"] == 1 and r["n_words"] == 10


def test_nav_and_footer_dropped_content_kept(spark):
    r = _one(
        spark,
        '<body><div class="nav"><a href="/">Home page link</a> '
        '<a href="/x">Another nav link</a></div>'
        f"<p>{CONTENT}</p>"
        '<div class="footer"><a href="/tos">Terms</a> '
        '<a href="/priv">Privacy</a> Copyright 2020</div></body>',
    )
    assert r["main_text"] == CONTENT
    assert r["n_kept"] == 1
    assert r["n_blocks"] == 3  # nav, content, footer all have visible text


def test_min_words_boundary(spark):
    # 5 words = kept (>= min_words), 4 words = dropped
    r5 = _one(spark, "<p>one two three four five</p>")
    r4 = _one(spark, "<p>one two three four</p>")
    assert r5["n_kept"] == 1 and r5["n_words"] == 5
    assert r4["n_kept"] == 0 and r4["main_text"] == ""


def test_link_density_boundary_integer_exact(spark):
    # 10 words, 3 in anchors: 100*3 <= 30*10 → KEPT (exactly at the bar)
    at_bar = _one(
        spark,
        '<p>alpha beta gamma delta epsilon zeta eta <a href="/">one two three</a></p>',
    )
    assert at_bar["n_kept"] == 1
    # 10 words, 4 in anchors: 400 > 300 → dropped
    over = _one(
        spark,
        '<p>alpha beta gamma delta epsilon zeta <a href="/">one two three four</a></p>',
    )
    assert over["n_kept"] == 0


def test_entity_unescape_order(spark):
    # "&amp;lt;" must become the literal text "&lt;" (amp decoded LAST),
    # and &nbsp; participates in the extracted text as a space
    r = _one(
        spark,
        "<p>a &amp;lt; b &lt; c &gt; d &quot;q&quot; &#39;s&#39; x&nbsp;y "
        "padding words here now</p>",
    )
    assert "&lt; b" in r["main_text"][2:]  # the decoded &amp;lt;
    assert "< c > d \"q\" 's'" in r["main_text"]
    assert "x y" in r["main_text"]


def test_inline_tags_do_not_split_blocks(spark):
    r = _one(
        spark,
        "<p>one <b>two</b> three <i>four</i> five <span>six</span> seven</p>",
    )
    assert r["n_kept"] == 1
    assert r["main_text"] == "one two three four five six seven"


def test_whitespace_collapse_and_counts(spark):
    r = _one(
        spark,
        "<div>alpha\n\n  beta\t\tgamma   delta epsilon</div><div></div><br>",
    )
    assert r["main_text"] == "alpha beta gamma delta epsilon"
    assert r["n_blocks"] == 1 and r["n_words"] == 5


def test_case_insensitive_tags(spark):
    r = _one(
        spark,
        "<P>one two three four five six</P><SCRIPT>var leak_upper=1;</SCRIPT>",
    )
    assert r["n_kept"] == 1
    assert "leak_upper" not in r["main_text"]


def test_param_validation(spark):
    df = None
    with pytest.raises(ValueError):
        extract_main_content(df, min_words=0)
    with pytest.raises(ValueError):
        extract_main_content(df, link_pct=0)
    with pytest.raises(ValueError):
        extract_main_content(df, link_pct=101)


def test_warc_extract_clean_composed_pipeline(spark, sf_dir, tmp_path):
    """The full ingestion chain: decorated HTML pages → member-gzip WARC
    export → warc_archive DataSource read-back → main-content
    extraction → t6-style quality scoring. Extraction over the WARC
    round trip must equal extraction over the original pages (the
    container is lossless), and the extracted text must be clean enough
    that quality scoring runs on prose, not markup."""
    import os

    from fhir_etl_spark.operators.text import quality_score
    from fhir_etl_spark.queries.text import _t24_page_col
    from fhir_etl_spark.session import load_tables
    from fhir_etl_spark.sources.warc import (
        WarcDataSource,
        http_response_record,
        write_warc,
    )

    documents = load_tables(spark, sf_dir, "documents").select("doc_id", "text")
    pages = documents.select("doc_id", _t24_page_col().alias("html"))

    rows = pages.orderBy("doc_id").limit(40).collect()
    records = [
        http_response_record(
            f"http://corpus.local/{r['doc_id']}",
            r["html"].encode("utf-8"),
            record_id=f"doc-{r['doc_id']}",
        )
        for r in rows
    ]
    path = os.path.join(str(tmp_path), "pages.warc.gz")
    with open(path, "wb") as f:
        f.write(write_warc(records, gzip_members=True))

    try:
        spark.dataSource.register(WarcDataSource)
    except Exception:
        pass
    scanned = (
        spark.read.format("warc_archive")
        .option("paths", path)
        .load()
        .where(F.col("warc_type") == "response")
        .select(
            F.regexp_extract("target_uri", r"/(\d+)$", 1).cast("long").alias("doc_id"),
            F.col("payload").alias("html"),
        )
    )
    via_warc = {
        r["doc_id"]: r
        for r in extract_main_content(scanned).collect()
    }
    direct = {
        r["doc_id"]: r
        for r in extract_main_content(
            pages.orderBy("doc_id").limit(40)
        ).collect()
    }
    assert set(via_warc) == set(direct) and len(direct) == 40
    for k in direct:
        assert via_warc[k]["main_text"] == direct[k]["main_text"]
        assert via_warc[k]["n_words"] == direct[k]["n_words"]

    # downstream t6-style cleaning runs on prose: no markup survives,
    # and quality scores are computable on every extracted row
    cleaned = (
        extract_main_content(scanned)
        .select("doc_id", quality_score("main_text").alias("q"))
        .collect()
    )
    assert len(cleaned) == 40
    assert all(r["q"] is not None for r in cleaned)
    leaked = extract_main_content(scanned).where(
        F.col("main_text").rlike("<[a-zA-Z/]") | F.col("main_text").contains("var t =")
    )
    assert leaked.count() == 0


def test_extract_is_streamable_and_equals_batch(spark, sf_dir, tmp_path):
    """t24 is a pure stateless projection, so the SAME operator runs
    unchanged under Structured Streaming — the §2.10 twin without a
    twin module. Replaying the decorated pages through a file stream
    must reproduce the batch extraction row-for-row."""
    import uuid

    from fhir_etl_spark.queries.text import _t24_page_col
    from fhir_etl_spark.session import load_tables

    pages = (
        load_tables(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .limit(30)
        .select("doc_id", _t24_page_col().alias("html"))
    )
    src = str(tmp_path / "pages_src")
    pages.coalesce(2).write.mode("overwrite").parquet(src)

    batch = {
        r["doc_id"]: (r["main_text"], r["n_blocks"], r["n_kept"], r["n_words"])
        for r in extract_main_content(spark.read.parquet(src)).collect()
    }
    table = f"t24_stream_{uuid.uuid4().hex[:8]}"
    q = (
        extract_main_content(
            spark.readStream.schema("doc_id long, html string").parquet(src)
        )
        .writeStream.format("memory")
        .queryName(table)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["main_text"], r["n_blocks"], r["n_kept"], r["n_words"])
        for r in spark.sql(f"SELECT * FROM {table}").collect()
    }
    assert got == batch and len(got) == 30
