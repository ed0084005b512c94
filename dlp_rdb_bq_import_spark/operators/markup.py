"""Markdown / source-code normalization — the two non-HTML formats a
web-scale training corpus meets most (READMEs, wikis, forums render
markdown; code corpora are their own modality), normalized the way the
public corpus pipelines do it: format syntax stripped to prose for the
quality/dedup stages, structure (headings) extracted as metadata, code
comments stripped for near-dup keys (the BigCode/CodeParrot-style
normalization — two files differing only in comments and whitespace
are the same program).

Spark-first shape: every operator is a JVM-side ``regexp_replace`` /
``regexp_extract_all`` expression chain — zero UDFs, zero joins except
markdown_outline's posexplode; everything runs inside whole-stage
codegen as a pure map over the corpus, and every regex is the
RE2-compatible subset (no backrefs, no lookaround) so an ANSI-SQL
engine restates it verbatim (the correctness gate).

Honest simplifications (both engines apply the identical rule):
these are REGEX normalizers, not parsers — markdown emphasis strips
``*`` runs but leaves ``_`` (snake_case identifiers are prose here),
and code comment-stripping is lexer-free, so a comment-looking
sequence INSIDE a string literal is stripped too. Both are the
standard trade for dedup keys and quality features, where uniformity
across engines matters and compilation does not.

The reference has no text surface at all (its unit of work is an RDB
row batch — common/TableToDbRowFn.java); this extends the engine's
format-aware cleaning family next to html_extract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# fenced code blocks: ``` ... ``` spans, dotall non-greedy
FENCE_RE = r"(?s)```.*?```"
# inline code spans: `...` (single backticks, no nesting)
INLINE_CODE_RE = r"`[^`]*`"
# images BEFORE links (an image is a link with a ! prefix)
IMAGE_RE = r"!\[([^\]]*)\]\([^)]*\)"
LINK_RE = r"\[([^\]]*)\]\([^)]*\)"
HEADING_MARK_RE = r"(?m)^#{1,6}[ \t]*"
BLOCKQUOTE_RE = r"(?m)^>[ \t]?"
BULLET_RE = r"(?m)^[ \t]*[-+*][ \t]+"
ORDERED_RE = r"(?m)^[ \t]*[0-9]+[.)][ \t]+"
HRULE_RE = r"(?m)^[-*]{3,}[ \t]*$"
EMPHASIS_RE = r"\*{1,3}"
HEADING_LINE_RE = r"(?m)^#{1,6}[ \t]+[^\n]+$"

# block comments first (a // inside /* */ must go with its block),
# then line comments; lexer-free by design (see module docstring)
BLOCK_COMMENT_RE = r"(?s)/\*.*?\*/"
LINE_COMMENT_RE = r"(?m)(//|#)[^\n]*"


def markdown_strip(col: Column) -> Column:
    """Flatten markdown to whitespace-normalized prose: fenced and
    inline code spans DROP (they are code, not prose — the quality
    and language-ID features downstream must not see them), images
    and links keep their visible text, heading/blockquote/list/rule
    markers and ``*`` emphasis strip, whitespace collapses. Pure
    expression chain; order matters and is fixed (fences before
    inline code, images before links)."""
    c = F.regexp_replace(col, FENCE_RE, " ")
    c = F.regexp_replace(c, INLINE_CODE_RE, " ")
    c = F.regexp_replace(c, IMAGE_RE, "$1")
    c = F.regexp_replace(c, LINK_RE, "$1")
    c = F.regexp_replace(c, HRULE_RE, " ")
    c = F.regexp_replace(c, HEADING_MARK_RE, "")
    c = F.regexp_replace(c, BLOCKQUOTE_RE, "")
    c = F.regexp_replace(c, BULLET_RE, "")
    c = F.regexp_replace(c, ORDERED_RE, "")
    c = F.regexp_replace(c, EMPHASIS_RE, "")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def markdown_outline(
    df: DataFrame,
    md_col: str,
    id_col: str,
) -> DataFrame:
    """Document structure as metadata: one row per markdown heading in
    document order — ``(id_col, heading_ord, level, title)`` with
    ``level`` the number of ``#`` marks (1-6) and ``title`` the
    whitespace-normalized heading text. Headings inside fenced code
    blocks do NOT count (fences drop first — a ``# comment`` in a
    code sample is not structure). One regexp_extract_all +
    posexplode; per-element level/title re-parse — the same
    match-once-reparse-per-element shape as
    html_extract.extract_links_with_text."""
    cleaned = F.regexp_replace(F.col(md_col), FENCE_RE, " ")
    hits = F.regexp_extract_all(cleaned, F.lit(HEADING_LINE_RE), 0)
    out = df.select(
        F.col(id_col),
        F.posexplode(hits).alias("_p", "_h"),
    )
    level = F.length(F.regexp_extract(F.col("_h"), r"^(#{1,6})", 1)).cast(
        "long"
    )
    title = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("_h"), r"^#{1,6}[ \t]+", ""), r"\s+", " "
        )
    )
    return out.select(
        id_col,
        (F.col("_p") + 1).cast("long").alias("heading_ord"),
        level.alias("level"),
        title.alias("title"),
    )


def code_normalize(col: Column) -> Column:
    """Comment-and-whitespace-insensitive code form for dedup keys
    (the BigCode/CodeParrot normalization): strip ``/* */`` block
    comments, then ``//`` and ``#`` line comments, lowercase nothing
    (code is case-sensitive), collapse all whitespace runs to one
    space, trim. Two files differing only in comments/formatting map
    to the same key; fingerprint with md5/xxhash downstream exactly
    like text dedup."""
    c = F.regexp_replace(col, BLOCK_COMMENT_RE, " ")
    c = F.regexp_replace(c, LINE_COMMENT_RE, " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))
