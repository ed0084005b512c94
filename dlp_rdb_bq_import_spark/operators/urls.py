"""URL canonicalization and URL-level dedup.

A web-corpus pipeline's FIRST dedup key is the URL: crawls re-fetch
the same page under cosmetically different URLs (scheme/host case,
default ports, ``www.``, trailing slashes, tracking parameters,
fragments), and canonicalizing before the content stages cuts the
corpus before any text is even read. The normalization steps are the
standard public ones (RFC 3986 §6 syntax-based normalization plus the
universal tracking-parameter strip).

Spark-first shape: parsing and every normalization step are JVM-side
expression chains — ``regexp_extract`` component parsing (the
RE2-compatible subset, so any SQL engine restates it), higher-order
array functions for the parameter filter/sort — zero UDFs; the only
shuffle anywhere in the family is the groupBy of
:func:`dedup_by_canonical_url`, keyed on the canonical string. Spark's
built-in ``parse_url`` is deliberately NOT used: it is Java-only
(no oracle twin) and its component semantics differ subtly from the
regex chain a cross-engine pipeline can pin.

The reference has no URL surface (its sources are RDB tables —
common/ServerUtil.java); this extends the engine toward the web-crawl
ingestion a 100 TB training corpus starts from.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
AUTHORITY_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
QUERY_RE = "\\?([^#]*)"
# the universal tracking params every pipeline strips (utm_* plus the
# common click ids); anchored at the key so 'ref=' matches but
# 'prefix=' doesn't
TRACKING_PARAM_RE = "^(utm_[a-z0-9]+|ref|fbclid|gclid|msclkid)="
REGISTERED_DOMAIN_RE = "([^.]+\\.[^.]+)$"


def url_components(url: Column) -> dict[str, Column]:
    """Parse scheme / host / path / query via anchored component
    regexes (missing components yield '' — both Java and RE2 agree).
    Exposed for feature queries; :func:`canonicalize_url` composes
    them."""
    return {
        "scheme": F.lower(F.regexp_extract(url, SCHEME_RE, 1)),
        "authority": F.lower(F.regexp_extract(url, AUTHORITY_RE, 1)),
        "path": F.regexp_extract(url, PATH_RE, 1),
        "query": F.regexp_extract(url, QUERY_RE, 1),
    }


def canonicalize_url(url: Column) -> dict[str, Column]:
    """RFC 3986-style syntax normalization: lowercase scheme+host,
    strip the scheme-default port (:80 http / :443 https), strip
    leading ``www.``, collapse trailing slashes to none ('' path →
    '/'), drop the fragment, drop tracking parameters, SORT the
    surviving query parameters (byte order — ASCII keys, identical in
    any engine). Returns columns: ``canon``, ``host``, ``domain``
    (registered domain = last two labels), ``path_depth``.

    Semantics note, documented honestly: parameter ORDER is treated as
    insignificant (sorting is what makes ?a=1&b=2 and ?b=2&a=1 the
    same page — true for the overwhelming crawl majority, wrong for
    the rare order-sensitive endpoint) and percent-encoding is NOT
    re-normalized (%2F vs / ambiguity needs a decoder with
    reserved-set awareness; a mechanical decode would MERGE distinct
    URLs, the unsafe direction for a dedup key).
    """
    c = url_components(url)
    host = c["authority"]
    host = (
        F.when(c["scheme"] == "https", F.regexp_replace(host, ":443$", ""))
        .when(c["scheme"] == "http", F.regexp_replace(host, ":80$", ""))
        .otherwise(host)
    )
    host = F.regexp_replace(host, "^www\\.", "")
    path = F.regexp_replace(c["path"], "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.array_sort(
        F.filter(
            F.split(c["query"], "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return {
        "canon": F.concat(c["scheme"], F.lit("://"), host, path, qs),
        "host": host,
        "domain": F.regexp_extract(host, REGISTERED_DOMAIN_RE, 1),
        "path_depth": F.size(
            F.filter(F.split(path, "/"), lambda x: x != "")
        ).cast("long"),
    }


def dedup_by_canonical_url(
    df: DataFrame, url_col: str, id_col: str
) -> DataFrame:
    """URL-level dedup groups: one row per canonical URL with
    ``n_dupes`` (fetch count) and ``first_id`` (lowest id — the
    representative fetch a pipeline keeps). One groupBy on the
    canonical string — the scale shape is exactly exact-content dedup,
    but running BEFORE any page body is read.

    Relative or schemeless inputs (empty host after parsing — e.g. the
    ``/rel`` and ``#frag`` hrefs :func:`extract_links` emits verbatim)
    are DROPPED, not collapsed: their canonical forms would all share
    the degenerate ``:///...`` shape under host ``''`` and merge
    unrelated links into one row. Callers wanting them must resolve to
    absolute URLs against the page base first."""
    c = canonicalize_url(F.col(url_col))
    return (
        df.select(F.col(id_col), c["canon"].alias("canon"),
                  c["host"].alias("_host"))
        .where(F.col("_host") != "")
        .drop("_host")
        .groupBy("canon")
        .agg(
            F.count("*").alias("n_dupes"),
            F.min(id_col).alias("first_id"),
        )
    )


def anchor_text_index(
    links: DataFrame,
    id_col: str,
    url_col: str = "href",
    text_col: str = "anchor_text",
) -> DataFrame:
    """Inbound anchor-text aggregation — the classic web-corpus signal
    every search-engine-derived dataset carries (anchor text describes
    the TARGET page better than the target's own boilerplate; it feeds
    retrieval fields and quality/spam scoring). Input is a link table
    with the linking document id, the raw href, and its visible anchor
    text (``html_extract.extract_links_with_text`` emits exactly
    this); output is one row per (target canonical URL, anchor token):

    ``(canon, token, tf, n_docs)`` — ``tf`` the token's total
    occurrences across all inbound anchors, ``n_docs`` the distinct
    linking documents (the spam-resistance denominator: one page
    repeating a token a thousand times is not a thousand votes).

    Tokenization is the engine's canonical lowercase alphanumeric
    split (restatable in ANSI SQL); hrefs canonicalize through
    :func:`canonicalize_url` so cosmetic variants of the same target
    pool their anchors, and relative/schemeless hrefs are dropped
    (same guard and reason as :func:`dedup_by_canonical_url` —
    resolve to absolute first if you want them).

    Scale shape: canonicalize + tokenize + explode are map-side; the
    one shuffle is the groupBy on (canon, token) with partial
    aggregation — the same shape as a word-count, keyed by exactly
    what downstream consumers (retrieval field build, per-target
    joins) are partitioned by."""
    c = canonicalize_url(F.col(url_col))
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda x: x != "",
    )
    exploded = (
        links.select(
            F.col(id_col),
            c["canon"].alias("canon"),
            c["host"].alias("_host"),
            F.explode(toks).alias("token"),
        )
        .where(F.col("_host") != "")
    )
    return exploded.groupBy("canon", "token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct(id_col).alias("n_docs"),
    )


def merge_anchor_index(standing: DataFrame, batch: DataFrame) -> DataFrame:
    """Fold a new batch's anchor aggregate into the STANDING anchor
    index — the anchor-text family's maintenance step (the same
    persisted-artifact discipline as the MinHash/bench-gram/LM/NB/
    IVF/FastSS indexes): per (canon, token), counts add. Valid under
    the natural batching contract that each linking document's links
    arrive in exactly ONE batch (a crawl emits a page once) — then
    both ``tf`` and ``n_docs`` are disjoint-partition sums and
    merge ≡ rebuild-from-union exactly (pytest-pinned). One groupBy
    on the index's own key; the standing corpus's pages are never
    re-read."""
    cols = {"canon", "token", "tf", "n_docs"}
    for side, df in (("standing", standing), ("batch", batch)):
        if not cols.issubset(df.columns):
            raise ValueError(
                f"merge_anchor_index: {side} needs columns {sorted(cols)}, "
                f"got {df.columns}"
            )
    return (
        standing.select("canon", "token", "tf", "n_docs")
        .unionByName(batch.select("canon", "token", "tf", "n_docs"))
        .groupBy("canon", "token")
        .agg(F.sum("tf").alias("tf"), F.sum("n_docs").alias("n_docs"))
    )


def robots_filter(
    candidates: DataFrame,
    rules: DataFrame,
    url_col: str,
    id_col: str,
) -> DataFrame:
    """Robots-exclusion screening for the crawl frontier (RFC 9309,
    the public Robots Exclusion Protocol): each candidate URL is
    checked against its host's allow/disallow path rules; the
    LONGEST-matching rule decides, an allow wins a length tie, and a
    URL whose host has no matching rule is allowed (REP's default).
    ``rules`` carries one row per (host, path_prefix, allow boolean) —
    the parsed form of each host's robots.txt, with the empty-
    ``Disallow:`` (allow-all) line represented by emitting no rule.
    Literal path prefixes only — RFC 9309's ``*``/``$`` wildcards are
    a documented simplification (both engines restate the same rule).

    Output: one row per candidate —
    ``(id_col, canon, host, path, allowed, rule)`` where ``path`` is
    the path-and-query the server would see (fragment stripped, ''
    normalized to '/') and ``rule`` is the deciding prefix (NULL when
    no rule matched). Relative/schemeless candidates drop (the
    family's guard).

    Scale shape: rules are robots.txt-cardinality (per-host dozens) —
    the join is broadcast territory; prefix matching is a codegen
    substring compare, and the longest-match pick is one max(struct)
    aggregation keyed by candidate (lexicographic struct max =
    longest-then-allow-then-prefix, deterministic). No window, no
    all-pairs."""
    if not {"host", "path_prefix", "allow"}.issubset(rules.columns):
        raise ValueError(
            f"robots_filter: rules needs (host, path_prefix, allow), "
            f"got {rules.columns}"
        )
    c = canonicalize_url(F.col(url_col))
    # REP matches the path-and-query as sent ('' requests match as '/');
    # the fragment never reaches the server
    pathq = F.regexp_extract(
        F.col(url_col), "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1
    )
    cand = candidates.select(
        F.col(id_col),
        c["canon"].alias("canon"),
        c["host"].alias("host"),
        F.when(pathq == "", F.lit("/")).otherwise(pathq).alias("path"),
    ).where(F.col("host") != "")
    r = rules.select(
        F.col("host").alias("_rhost"), "path_prefix", "allow"
    )
    # prefix match INSIDE the left join: a candidate whose host has
    # rules but none matching must survive as a single null-rule row
    # (REP default-allow), not be filtered away
    matched = cand.join(
        F.broadcast(r),
        (F.col("host") == F.col("_rhost"))
        & F.col("path").startswith(F.col("path_prefix")),
        "left",
    )
    pick = matched.groupBy(id_col, "canon", "host", "path").agg(
        F.max(
            F.when(
                F.col("path_prefix").isNotNull(),
                F.struct(
                    F.length("path_prefix").alias("_len"),
                    F.col("allow").alias("_allow"),
                    F.col("path_prefix").alias("_rule"),
                ),
            )
        ).alias("_best")
    )
    return pick.select(
        id_col,
        "canon",
        "host",
        "path",
        F.coalesce(F.col("_best._allow"), F.lit(True)).alias("allowed"),
        F.col("_best._rule").alias("rule"),
    )


def frontier_next_batch(
    candidates: DataFrame,
    seen: DataFrame,
    url_col: str,
    id_col: str,
    per_host_cap: int = 10,
    keep_overflow: bool = False,
) -> DataFrame:
    """The crawl-frontier step: from candidate URLs, the next fetch
    batch — canonical forms NOT already fetched (anti-join against the
    persisted ``seen`` canonical set — the URL twin of the engine's
    incremental-dedup/persisted-index family), capped per HOST
    (politeness: a batch must not hammer one server). Within a host,
    lowest id wins (deterministic; id is discovery order in a real
    frontier). Output: ``(id_col, canon, host, rk)`` with rk the
    1-based slot inside the host's cap.

    Scale shape: canonicalization is map-side; the anti-join and the
    per-host top-k window shuffle on canon/host — both keys the crawl
    state is naturally partitioned by. The seen set is the persisted
    artifact; candidates are the (much smaller) discovery batch.

    ``keep_overflow=True`` skips the cap filter and returns EVERY
    fresh candidate with its rk, so a caller managing a pending queue
    (the streaming frontier) can split scheduled (rk ≤ cap) from
    overflow (rk > cap) and re-queue the latter — canonicalization is
    idempotent (pytest-pinned), so overflow canon strings round-trip
    through the queue unchanged.
    """
    if per_host_cap < 1:
        raise ValueError(f"per_host_cap must be >= 1, got {per_host_cap}")
    if "canon" not in seen.columns:
        raise ValueError(f"seen must carry a 'canon' column; got {seen.columns}")
    c = canonicalize_url(F.col(url_col))
    # relative/schemeless candidates (empty host) are dropped — see
    # dedup_by_canonical_url: their degenerate ':///...' canonical
    # forms would collapse unrelated links into one frontier slot
    cand = candidates.select(
        F.col(id_col), c["canon"].alias("canon"), c["host"].alias("host")
    ).where(F.col("host") != "")
    # one candidate slot per canonical URL (duplicate discoveries of
    # the same page collapse first — lowest id represents)
    cand = (
        cand.groupBy("canon", "host")
        .agg(F.min(id_col).alias(id_col))
        .join(seen.select("canon").distinct(), "canon", "left_anti")
    )
    w = Window.partitionBy("host").orderBy(F.col(id_col).asc())
    out = cand.withColumn("rk", F.row_number().over(w).cast("long"))
    if not keep_overflow:
        out = out.where(F.col("rk") <= per_host_cap)
    return out.select(id_col, "canon", "host", "rk")


SITEMAP_URL_RE = r"(?is)<url\s*>.*?</url\s*>"
SITEMAP_LOC_RE = r"(?is)<loc\s*>\s*(.*?)\s*</loc\s*>"
SITEMAP_LASTMOD_RE = r"(?is)<lastmod\s*>\s*(.*?)\s*</lastmod\s*>"


def extract_sitemap_entries(
    df: DataFrame,
    xml_col: str,
    id_col: str,
) -> DataFrame:
    """Sitemap-protocol parsing (sitemaps.org — the public crawl-seed
    standard): one row per ``<url>`` entry in document order, emitting
    ``(id_col, entry_ord, loc, lastmod)`` — ``loc`` whitespace-trimmed,
    ``lastmod`` NULL when the optional element is absent (W3C
    datetime string passed through verbatim; parsing it is the
    consumer's typed decision). Feeds the crawl frontier exactly like
    extracted outlinks but with the site's OWN freshness hints —
    frontier_next_batch can prioritize on lastmod recency instead of
    discovery order.

    Entries missing a ``<loc>`` are dropped (the spec makes loc
    required; an entry without one carries nothing to schedule).
    Index files (``<sitemapindex>``) work through the same shape:
    their ``<sitemap>`` children are not ``<url>`` elements, so a
    sitemap index simply yields zero rows here and its nested
    sitemaps are fetched by the frontier like any URL.

    Pure regexp_extract_all + posexplode expression chain (RE2
    subset, oracle-restatable), zero joins/UDFs — a map over fetched
    sitemap bodies at any scale."""
    entries = df.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(F.col(xml_col), F.lit(SITEMAP_URL_RE), 0)
        ).alias("_p", "_e"),
    )
    loc = F.regexp_extract(F.col("_e"), SITEMAP_LOC_RE, 1)
    lastmod = F.regexp_extract(F.col("_e"), SITEMAP_LASTMOD_RE, 1)
    return (
        entries.select(
            id_col,
            (F.col("_p") + 1).cast("long").alias("entry_ord"),
            loc.alias("loc"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
        )
        .where(F.col("loc") != "")
    )
