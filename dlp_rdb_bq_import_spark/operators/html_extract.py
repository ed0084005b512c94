"""HTML/markup boilerplate extraction — the pre-dedup cleaning stage
of a web-scale training-data pipeline.

Raw crawled HTML is mostly chrome: navigation, share bars, footers,
cookie banners. The public-algorithm family for separating main
content from boilerplate is block-level shallow-text classification —
jusText (Pomikálek, PhD thesis 2011) and Boilerpipe (Kohlschütter,
Fankhauser & Nejdl, WSDM 2010) both segment the page into blocks at
block-level tag boundaries and classify each block by densitometric
features: block length, LINK DENSITY (fraction of block characters
inside anchor tags), and STOPWORD DENSITY (fraction of words from a
small function-word list — real prose has them, link lists and
copyright lines don't). This module implements that family's core
heuristics.

Spark-first shape: everything is a JVM-side expression chain —
``regexp_replace`` / ``split`` / ``posexplode`` / higher-order array
functions — no Python UDFs anywhere, so the whole stage runs inside
whole-stage codegen, scales as a pure map over the corpus (the only
exchange is the per-document reassembly groupBy in
:func:`extract_main_content`), and results hash-match an ANSI-SQL
restatement (the correctness gate). Regexes are restricted to the
RE2-compatible subset (no backrefs, no lookaround) so Java and
DuckDB/RE2 agree.

Simplifications vs the full jusText algorithm, documented honestly:
the context-sensitive reclassification is a SINGLE pass over the
initial classes (a near-good block adjacent to an initially-good
neighbor becomes content) rather than jusText's iterated smoothing,
and dropped-span matching pairs open/close tags by name without
nesting awareness — both engines apply the identical rule, and the
densitometric features are the load-bearing part of the family.

The reference has no text surface at all (its unit of work is an RDB
row batch — common/TableToDbRowFn.java:41-108; the DLP transforms are
delegated wholesale), so this module EXTENDS the engine the direction
a 100 TB web-corpus curation pipeline needs, feeding the existing
quality gates (text.quality_score, text.gopher_quality_flags) and the
dedup/decontamination families with CLEANED text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Block-level tag boundaries (open or close): the segmentation points.
# <title> is deliberately absent — head text then falls into the first
# block and is dropped by the short-block rule, like jusText's header
# handling. Non-capturing group: neither engine's split emits groups.
BLOCK_SPLIT_RE = (
    r"(?i)</?(?:p|div|td|th|h[1-6]|li|ul|ol|table|tr|nav|header|footer|"
    r"aside|article|section|main|body|html|blockquote|pre|form|br)[^>]*>"
)
# Spans whose CONTENT must go, not just the tags: scripts, styles,
# comments. Non-greedy, dotall; pairs tags by the alternation without
# nesting awareness (documented simplification).
DROP_SPANS_RE = (
    r"(?is)<(?:script|style|noscript|template)[^>]*>"
    r".*?</(?:script|style|noscript|template)>|<!--.*?-->"
)
INLINE_TAG_RE = r"<[^>]*>"
ANCHOR_TEXT_RE = r"(?is)<a[^>]*>(.*?)</a>"
# href in any of the three HTML attribute-value forms; the single
# capture group keeps quotes (stripped exactly by the caller's slice)
HREF_RE = (
    "(?is)<a\\s[^>]*?href\\s*=\\s*"
    "(\"[^\"]*\"|'[^']*'|[^\\s>\"'][^\\s>]*)"
)
# a FULL href-carrying anchor element, open tag through </a> —
# non-greedy body (anchors cannot nest in HTML); group 0 is the
# element, re-parsed per match for href + inner text
FULL_ANCHOR_RE = HREF_RE + "[^>]*>.*?</a>"

# Decode order matters: named/numeric entities first, &amp; LAST —
# otherwise "&amp;lt;" would double-decode to "<" instead of "&lt;".
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

# Function words for the stopword-density feature (jusText ships
# per-language lists; this is the English core — callers pass their
# own for other languages).
DEFAULT_STOPWORDS = (
    "the", "a", "an", "and", "of", "to", "in", "is", "on", "for", "with",
)


def decode_entities(col: Column) -> Column:
    """The six core HTML entities as a fixed replace chain (identical
    in any SQL engine; ``&amp;`` last — see _ENTITIES)."""
    for ent, ch in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def visible_text(col: Column) -> Column:
    """The shared fragment-to-visible-text chain: strip inline tags,
    decode entities, collapse/trim whitespace. Applied identically to
    block text, anchor text (link_density's numerator), and extracted
    anchor strings so every feature measures the same rendered
    characters."""
    return F.trim(
        F.regexp_replace(
            decode_entities(F.regexp_replace(col, INLINE_TAG_RE, " ")),
            r"\s+",
            " ",
        )
    )


def strip_tags(col: Column) -> Column:
    """Flatten an HTML string to whitespace-normalized text: drop
    script/style/comment SPANS, strip remaining tags, decode entities,
    collapse whitespace. Pure expression — usable standalone as the
    crude "just give me the text" path when block classification isn't
    wanted."""
    c = F.regexp_replace(col, DROP_SPANS_RE, " ")
    c = F.regexp_replace(c, INLINE_TAG_RE, " ")
    c = decode_entities(c)
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def extract_links(
    df: DataFrame,
    html_col: str,
    id_col: str,
) -> DataFrame:
    """Outlink extraction — the crawl-expansion half of a web
    pipeline: one row per ``<a href=...>`` in document order,
    emitting ``(id_col, link_ord, href)`` with ``link_ord`` the
    1-based position of the anchor within the page. All three HTML
    attribute-value forms are supported — double-quoted,
    single-quoted, and unquoted (``href=x`` up to whitespace/``>``;
    an EMPTY unquoted value never matches, per the HTML spec's own
    prohibition) — via ONE alternation regex whose single capture
    group keeps the quotes, stripped afterwards by an exact
    first/last-char slice (quoted captures always carry matching
    quotes, so the slice is precise where a char-class trim would eat
    legitimate quote characters inside the value). Only true ``<a>``
    tags — the required whitespace after the tag name keeps
    ``<area>``/``<abbr>`` and friends out. RE2-subset,
    oracle-restatable; then a ``posexplode``. Pure expression chain,
    zero joins/UDFs: at 100 TB this is a map over the crawl, and the
    downstream host-graph aggregation is the first shuffle. Pages
    with no links emit nothing (explode, not explode_outer — a link
    TABLE, not a page audit)."""
    hits = F.regexp_extract_all(
        F.col(html_col), F.lit(HREF_RE), 1
    )
    unquoted = F.transform(hits, _strip_href_quotes)
    return df.select(
        F.col(id_col),
        F.posexplode(unquoted).alias("_p", "href"),
    ).select(
        id_col,
        (F.col("_p") + 1).cast("long").alias("link_ord"),
        "href",
    )


def _strip_href_quotes(h: Column) -> Column:
    """Exact first/last-char slice for HREF_RE captures (quoted
    captures always carry matching quotes; unquoted never start with
    one)."""
    return F.when(
        F.substring(h, 1, 1).isin('"', "'"),
        h.substr(F.lit(2), F.length(h) - 2),
    ).otherwise(h)


def extract_links_with_text(
    df: DataFrame,
    html_col: str,
    id_col: str,
) -> DataFrame:
    """:func:`extract_links` plus the VISIBLE anchor text — the input
    the inbound anchor-text signal (``urls.anchor_text_index``) needs:
    one row per href-carrying anchor in document order, emitting
    ``(id_col, link_ord, href, anchor_text)``. Full anchor elements
    match once (all three href forms, same contract as
    extract_links), then each element re-parses for its href
    (quote-stripped exactly) and its inner HTML, which flattens
    through the same strip/decode/normalize chain as block text —
    ``<a href="/x"><b>Read&nbsp;more</b></a>`` yields ``Read more``.
    Pure expression chain, zero joins/UDFs; a map over the crawl at
    any scale. Anchors without an href don't emit (no href, no edge);
    empty anchor text comes through as ``''`` (image links — real
    rows, the aggregation's tokenizer drops them naturally)."""
    anchors = F.regexp_extract_all(F.col(html_col), F.lit(FULL_ANCHOR_RE), 0)
    out = df.select(
        F.col(id_col),
        F.posexplode(anchors).alias("_p", "_a"),
    )
    href = _strip_href_quotes(F.regexp_extract(F.col("_a"), HREF_RE, 1))
    atext = visible_text(F.regexp_extract(F.col("_a"), ANCHOR_TEXT_RE, 1))
    return out.select(
        id_col,
        (F.col("_p") + 1).cast("long").alias("link_ord"),
        href.alias("href"),
        atext.alias("anchor_text"),
    )


def html_blocks(
    df: DataFrame,
    html_col: str,
    id_col: str,
    *,
    min_words: int = 5,
    max_link_density: float = 0.4,
    min_stop_density: float = 0.0,
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
) -> DataFrame:
    """Segment HTML into blocks and classify each content/boilerplate.

    Output: ``(id_col, block_ord, text, n_words, n_chars,
    link_density, stop_density, verdict)`` — one row per NON-EMPTY
    block, ``block_ord`` numbering non-empty blocks 1..n in document
    order (empty inter-tag fragments never get an ordinal, so
    numbering is stable across engines' empty-split conventions).

    Features (per jusText/Boilerpipe):
    - ``n_words`` — whitespace token count of the stripped block text;
    - ``link_density`` — anchor TEXT chars / block text chars (round
      9), where anchor text is the anchors' inner HTML put through the
      SAME strip-tags/decode-entities/normalize chain as the block
      text (jusText's feature is visible anchor characters — raw inner
      HTML would count markup and can exceed 1.0); link-dense blocks
      are navigation;
    - ``stop_density`` — stopword tokens / tokens (round 9), matched
      case-INsensitively (sentence-initial "The" is still a stopword);
      prose has function words, chrome doesn't.

    Classification (the simplified jusText two-stage):
    initial class is 'bad' when ``link_density > max_link_density`` OR
    ``stop_density < min_stop_density``; else 'good' when ``n_words >=
    min_words``; else 'near' (short but prose-shaped — passes both
    density gates). The context pass then turns a 'near' block into
    content iff an ADJACENT block (prev/next non-empty block in
    document order) is initially 'good' — jusText's near-good
    smoothing, single-pass over initial classes (documented
    simplification: no fixpoint iteration). Final ``verdict`` is
    'content' / 'boilerplate'. ``min_stop_density`` defaults OFF (0.0)
    because it is language-dependent.

    Scale shape: split/explode/feature/classify is a flat map over
    documents — no joins, no UDFs; the one exchange is the
    per-document sort that numbers a page's handful of blocks and
    feeds the lag/lead context pass (same window spec, one shuffle on
    ``id_col``, payload bounded by blocks-per-page).
    """
    from . import fan_out

    cleaned = F.regexp_replace(F.col(html_col), DROP_SPANS_RE, " ")
    # split/feature regex CPU ∝ HTML bytes, but the scan partitioning
    # is sized for RAW bytes — widen to the session's parallelism when
    # narrower (conditional: a corpus-scale scan passes through
    # untouched, so no full-corpus shuffle is ever inserted)
    b = fan_out(df).select(
        F.col(id_col),
        F.posexplode(F.split(cleaned, BLOCK_SPLIT_RE)).alias("_pos", "_raw"),
    )
    text = visible_text(F.col("_raw"))
    link_chars = F.aggregate(
        F.regexp_extract_all(F.col("_raw"), F.lit(ANCHOR_TEXT_RE), 1),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(visible_text(x)),
    )
    b = (
        b.withColumn("text", text)
        .withColumn("_link_chars", link_chars)
        .where(F.col("text") != "")
    )
    words = F.split(F.col("text"), " ")
    stops = F.filter(words, lambda w: F.lower(w).isin(*stopwords))
    b = (
        b.withColumn("n_words", F.size(words).cast("long"))
        .withColumn("n_chars", F.length("text").cast("long"))
        .withColumn(
            "link_density",
            F.round(
                F.col("_link_chars").cast("double")
                / F.col("n_chars").cast("double"),
                9,
            ),
        )
        .withColumn(
            "stop_density",
            F.round(
                F.size(stops).cast("double") / F.col("n_words").cast("double"), 9
            ),
        )
    )
    klass = (
        F.when(
            (F.col("link_density") > F.lit(max_link_density))
            | (F.col("stop_density") < F.lit(min_stop_density)),
            F.lit("bad"),
        )
        .when(F.col("n_words") >= F.lit(min_words), F.lit("good"))
        .otherwise(F.lit("near"))
    )
    w = Window.partitionBy(id_col).orderBy("_pos")
    b = b.withColumn("_k", klass)
    verdict = F.when(
        (F.col("_k") == "good")
        | (
            (F.col("_k") == "near")
            & (
                (F.lag("_k").over(w) == "good")
                | (F.lead("_k").over(w) == "good")
            )
        ),
        F.lit("content"),
    ).otherwise(F.lit("boilerplate"))
    return b.withColumn("verdict", verdict).select(
        F.col(id_col),
        F.row_number().over(w).cast("long").alias("block_ord"),
        "text",
        "n_words",
        "n_chars",
        "link_density",
        "stop_density",
        "verdict",
    )


def extract_main_content(
    df: DataFrame,
    html_col: str,
    id_col: str,
    *,
    min_words: int = 5,
    max_link_density: float = 0.4,
    min_stop_density: float = 0.0,
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
) -> DataFrame:
    """Reassemble each document's CONTENT blocks, in order, into the
    cleaned main text: ``(id_col, main_text, n_blocks, n_chars)``.
    Documents with zero content blocks (pure-chrome pages) drop out —
    exactly the rows a curation pipeline wants gone before dedup.

    The reassembly is the operator's one exchange: a per-document
    groupBy whose payload is the kept block texts. Ordering is made
    deterministic (hash-matchable) by sorting the collected
    (block_ord, text) structs, never relying on collect_list order.
    """
    blocks = html_blocks(
        df,
        html_col,
        id_col,
        min_words=min_words,
        max_link_density=max_link_density,
        min_stop_density=min_stop_density,
        stopwords=stopwords,
    ).where(F.col("verdict") == "content")
    assembled = blocks.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("block_ord"), F.col("text")))
        ).alias("_blocks")
    )
    main = F.array_join(
        F.transform(F.col("_blocks"), lambda s: s.getField("text")), " "
    )
    return assembled.select(
        F.col(id_col),
        main.alias("main_text"),
        F.size("_blocks").cast("long").alias("n_blocks"),
        F.length(main).cast("long").alias("n_chars"),
    )


TABLE_RE = r"(?is)<table[^>]*>.*?</table>"
TR_RE = r"(?is)<tr[^>]*>.*?</tr>"
CELL_RE = r"(?is)<(t[dh])[^>]*>(.*?)</t[dh]\s*>"


def extract_tables(
    df: DataFrame,
    html_col: str,
    id_col: str,
) -> DataFrame:
    """HTML table extraction into long (cell-per-row) form — the
    structured-data harvest step of a web-corpus pipeline (tables are
    the densest fact source in a crawl; every public table-corpus
    effort — WebTables, WDC — starts exactly here). One output row
    per cell:

    ``(id_col, table_ord, row_ord, col_ord, is_header, cell_text)``

    — all ordinals 1-based in document order, ``is_header`` ⟺ the
    cell is ``<th>``, ``cell_text`` the cell's inner HTML flattened
    through the same :func:`visible_text` chain as block and anchor
    text (inline markup stripped, entities decoded, whitespace
    collapsed).

    Contract (documented simplifications, each the standard
    first-cut): non-NESTED tables only — the non-greedy table match
    pairs an outer ``<table`` with the FIRST ``</table>``, so a
    nested table truncates its parent (rare in the wild, and the
    consumer sees truncation, not corruption); colspan/rowspan are
    not expanded (``col_ord`` counts CELLS, not grid columns);
    ``<thead>/<tbody>`` wrappers pass through transparently because
    rows are matched globally within the table string.

    Pure three-level regexp_extract_all + posexplode expression chain
    — zero joins, zero UDFs; at 100 TB it is a map over the crawl
    whose output fans out by cells-per-page. RE2-subset regexes, so
    an oracle can restate the identical extraction."""
    tables = df.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(TABLE_RE), 0)
        ).alias("_t", "_tbl"),
    )
    rows = tables.select(
        id_col,
        (F.col("_t") + 1).cast("long").alias("table_ord"),
        F.posexplode(
            F.regexp_extract_all(F.col("_tbl"), F.lit(TR_RE), 0)
        ).alias("_r", "_row"),
    )
    cells = rows.select(
        id_col,
        "table_ord",
        (F.col("_r") + 1).cast("long").alias("row_ord"),
        F.posexplode(
            F.regexp_extract_all(F.col("_row"), F.lit(CELL_RE), 0)
        ).alias("_c", "_cell"),
    )
    return cells.select(
        id_col,
        "table_ord",
        "row_ord",
        (F.col("_c") + 1).cast("long").alias("col_ord"),
        (
            F.lower(F.regexp_extract(F.col("_cell"), CELL_RE, 1)) == "th"
        ).alias("is_header"),
        visible_text(F.regexp_extract(F.col("_cell"), CELL_RE, 2)).alias(
            "cell_text"
        ),
    )
