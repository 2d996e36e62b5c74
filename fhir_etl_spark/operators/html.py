"""HTML main-content extraction (boilerplate removal) — the step every
Common Crawl recipe runs between WARC ingestion (s12 delivers raw HTTP
bodies) and text cleaning (t6 expects clean prose): strip markup, split
the page into blocks, and keep only content-dense blocks, dropping
navigation, sidebars, footers, scripts, and link lists.

The block classifier is the simplified integer form of the
jusText/Kohlschütter family (Pomikálek 2011, *Removing Boilerplate and
Duplicate Content from Web Corpora*; Kohlschütter et al. 2010,
*Boilerplate Detection Using Shallow Text Features*): those systems
classify blocks chiefly by (a) block length and (b) link density, with
everything else a refinement. Both features here are exact integers —

    keep(block) ⇔ words(block) ≥ min_words
                  AND 100 · link_words(block) ≤ link_pct · words(block)

— so the whole extractor is cross-engine replayable (the DuckDB oracle
replays split/strip/count/keep verbatim; no float thresholds).

Scale shape: map-only, one row in → one row out, pure Catalyst codegen
(regexp_replace / split / transform / filter / aggregate) — no explode,
no shuffle, no Python. At 100 TB the cost is the page scan itself; the
regex work is per-block within each row's array, embarrassingly
parallel. Every regex below is deliberately in the COMMON dialect of
Java regex (Spark) and RE2 (DuckDB): no backreferences, no lookaround,
explicit whitespace classes (RE2's ``\\s`` lacks ``\\x0b``), inline
``(?is)`` flags only.

Known regex-tier limitation (shared by every regex extractor —
jusText's own preprocessor included): a ``>`` INSIDE a quoted
attribute value (``<div title="a > b">``) terminates the ``[^>]*`` tag
match early, leaving the tail as visible text. Full HTML5 tokenization
would need a real state machine; both engines replay the regex
behavior identically, so the contract stays deterministic — the
boilerplate classifier then usually drops the short junk block anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- shared regex vocabulary (imported by the t24 oracle so both ------
# --- engines compile byte-identical patterns) --------------------------

#: invisible containers: contents must vanish BEFORE block splitting
SCRIPT_RE = r"(?is)<script[^>]*>.*?</script>"
STYLE_RE = r"(?is)<style[^>]*>.*?</style>"
COMMENT_RE = r"(?s)<!--.*?-->"

#: block-level boundaries (opening or closing) — the split points.
#: Non-capturing group: a capturing group would change Java split()
#: semantics, and RE2 treats both identically only without captures.
BLOCK_SPLIT_RE = (
    r"(?i)</?(?:p|div|h1|h2|h3|h4|h5|h6|li|ul|ol|dl|dt|dd|table|thead|"
    r"tbody|tfoot|tr|td|th|br|hr|section|article|aside|header|footer|"
    r"nav|main|form|fieldset|blockquote|pre|figure|figcaption|address|"
    r"center|noscript)[^>]*>"
)

#: anchor inner HTML (group 1) — the link-density numerator
ANCHOR_RE = r"(?is)<a[^>]*>(.*?)</a>"

#: any remaining tag → space (inline tags: a, b, i, span, img, ...)
TAG_RE = r"<[^>]*>"

#: explicit whitespace class: Java's \s includes \x0b, RE2's does not —
#: the one dialect divergence that has already bitten t6's oracle.
#: Raw string: BOTH engines receive the escape-sequence text and parse
#: it themselves (printable when interpolated into the oracle SQL).
WS_RE = r"[ \t\n\x0b\f\r]+"

#: HTML entities unescaped on the EXTRACTED text (after the keep
#: decision — counts are taken on escaped text, identically on both
#: engines). &amp; must be LAST: "&amp;lt;" correctly becomes "&lt;".
ENTITY_MAP = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def _strip_invisible(html: Column) -> Column:
    out = F.regexp_replace(html, SCRIPT_RE, " ")
    out = F.regexp_replace(out, STYLE_RE, " ")
    return F.regexp_replace(out, COMMENT_RE, " ")


def _word_count(txt: Column) -> Column:
    # txt is already trimmed + single-space collapsed: words = spaces+1,
    # except the empty string (split('') -> [''] on both engines)
    return F.when(txt == "", F.lit(0)).otherwise(
        F.size(F.split(txt, " "))
    ).cast("long")


def _visible_text(raw: Column) -> Column:
    """Tags → space, whitespace collapsed to single spaces, trimmed."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(raw, TAG_RE, " "), WS_RE, " ")
    )


def unescape_entities(txt: Column) -> Column:
    for ent, ch in ENTITY_MAP:
        txt = F.replace(txt, F.lit(ent), F.lit(ch))
    return txt


def extract_main_content(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_words: int = 5,
    link_pct: int = 30,
) -> DataFrame:
    """→ (id, main_text, n_blocks, n_kept, n_words).

    - ``main_text``: kept blocks' visible text, newline-joined, HTML
      entities unescaped — the input t6-style cleaning expects;
    - ``n_blocks``: blocks with any visible text (boilerplate + content);
    - ``n_kept`` / ``n_words``: kept-block count and their word total —
      the coverage accounting a curation pipeline logs per page.

    Keep rule (see module docstring): at least ``min_words`` visible
    words AND anchor-text share of words at most ``link_pct`` percent.
    Both sides of both comparisons are BIGINT — no float ever appears.
    """
    if not (0 < link_pct <= 100):
        raise ValueError(f"link_pct must be in (0, 100], got {link_pct}")
    if min_words < 1:
        raise ValueError(f"min_words must be >= 1, got {min_words}")

    # Pass 1 — materialize the block array once (split re-evaluates its
    # child per use otherwise), then per block the two raw strings the
    # counters need: visible text and concatenated anchor inner-HTML.
    blocks = df.withColumn(
        "_blocks", F.split(_strip_invisible(F.col(html_col)), BLOCK_SPLIT_RE)
    ).withColumn(
        "_bt",
        F.transform(
            "_blocks",
            lambda b: F.struct(
                _visible_text(b).alias("txt"),
                _visible_text(
                    F.array_join(F.regexp_extract_all(b, F.lit(ANCHOR_RE), 1), " ")
                ).alias("atxt"),
            ),
        ),
    )
    # Pass 2 — counts from the materialized struct fields (each regex
    # above ran exactly once per block), then the integer keep rule.
    scored = blocks.withColumn(
        "_sc",
        F.transform(
            "_bt",
            lambda s: F.struct(
                s["txt"].alias("txt"),
                _word_count(s["txt"]).alias("words"),
                _word_count(s["atxt"]).alias("lwords"),
            ),
        ),
    ).withColumn(
        "_kept",
        F.filter(
            "_sc",
            lambda s: (s["words"] >= min_words)
            & (100 * s["lwords"] <= link_pct * s["words"]),
        ),
    )
    return scored.select(
        F.col(id_col),
        unescape_entities(
            F.array_join(F.transform("_kept", lambda s: s["txt"]), "\n")
        ).alias("main_text"),
        F.size(F.filter("_sc", lambda s: s["words"] > 0))
        .cast("long")
        .alias("n_blocks"),
        F.size("_kept").cast("long").alias("n_kept"),
        F.coalesce(
            F.aggregate(
                "_kept",
                F.lit(0).cast("long"),
                lambda acc, s: acc + s["words"],
            ),
            F.lit(0).cast("long"),
        ).alias("n_words"),
    )
