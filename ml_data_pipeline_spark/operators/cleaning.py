"""Text cleaning for training-data pipelines: PII redaction, HTML
stripping, whitespace normalization (SURVEY.md §2.9 scale extensions).

All operators are pure column expressions (JVM regexp engine, codegen-
fused) — at 100 TB each is a zero-shuffle projection over the scan.

Patterns are deliberately RE2-compatible (no backreferences, no
lookaround) so the DuckDB oracles can run the IDENTICAL pattern: Spark
(java.util.regex) and DuckDB (RE2) both use leftmost-first alternation
semantics, and these patterns avoid every construct where the engines
could diverge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ml_data_pipeline_spark.constants import WS_PLUS

# Order matters and is part of the contract: URLs first (they may embed
# '@' and digits), then emails, then IPs, then phone-like digit runs.
PII_PATTERNS: dict[str, str] = {
    "url": r"https?://[^ \t\n\x0B\f\r]+",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b(\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+?\d[\d().\- ]{7,}\d",
}


def _redacted(col: Column, kinds: tuple[str, ...]) -> Column:
    unknown = [k for k in kinds if k not in PII_PATTERNS]
    if unknown:
        # a typo'd kind silently shipping unredacted PII is the worst
        # possible failure mode for this operator (r10 review)
        raise ValueError(
            f"unknown PII kinds {unknown}; expected a subset of "
            f"{sorted(PII_PATTERNS)}"
        )
    out = col
    for kind in PII_PATTERNS:  # fixed application order, independent of `kinds` order
        if kind in kinds:
            out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind}>")
    return out


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    kinds: tuple[str, ...] = ("url", "email", "ip", "phone"),
) -> DataFrame:
    """Replace each PII match with a typed token ('<email>', '<url>', ...).
    Application order is fixed (url, email, ip, phone) regardless of the
    order `kinds` is given in, so redaction is deterministic."""
    return df.withColumn(out_col or text_col, _redacted(F.col(text_col), kinds))


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row match counts for every PII pattern — the audit view used to
    size redaction impact before destructive application."""
    t = F.col(text_col)
    return df.select(
        "*",
        *[
            F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{kind}")
            for kind, pat in PII_PATTERNS.items()
        ],
    )


def strip_html(df: DataFrame, text_col: str = "text", out_col: str | None = None) -> DataFrame:
    """Remove HTML/XML tags and decode the five core entities, then collapse
    runs of whitespace. Tag regex is the pragmatic `<[^>]+>` (not an HTML
    parser — malformed markup degrades gracefully to text)."""
    t = F.regexp_replace(F.col(text_col), r"<[^>]+>", " ")
    # '&amp;' decodes LAST (r10 review: decoding it first turned
    # author-escaped '&amp;lt;' into '&lt;' and then into '<' — double
    # unescaping that corrupts deliberately-escaped content)
    for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    t = F.trim(F.regexp_replace(t, WS_PLUS, " "))
    return df.withColumn(out_col or text_col, t)


def normalize_whitespace(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Collapse all whitespace runs to single spaces and trim."""
    return df.withColumn(
        out_col or text_col,
        F.trim(F.regexp_replace(F.col(text_col), WS_PLUS, " ")),
    )


# Tracking query parameters dropped during URL canonicalization (the set
# every web-crawl dedup pipeline strips before keying on the URL).
TRACKING_PARAM_RE = r"^(utm_[a-z]+|gclid|fbclid|ref)="


def canonicalize_url(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """Canonical URL form for URL-keyed dedup (the step BEFORE exact dedup
    in a web-crawl pipeline — raw crawl URLs for one page differ in case,
    'www.', default ports, tracking params, param order, and fragments,
    which fragments exact dedup if not normalized).

    Rules (deterministic, pure column expressions, zero shuffle):
    scheme+host lowercased; leading 'www.' and default ports :80/:443
    dropped; fragment dropped; tracking params (utm_*, gclid, fbclid, ref)
    removed; remaining query params sorted; trailing path slashes trimmed
    (bare host → '/'). Non-http(s)/relative URLs yield NULL (caller decides
    whether to keep or quarantine).

    All regexes are RE2-compatible so the DuckDB oracle runs the identical
    patterns (module contract above).
    """
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    nowww = F.regexp_replace(hostport, r"^www\.", "")
    # strip only the port that is DEFAULT for the scheme (r10 review:
    # unconditional :80/:443 stripping collapsed http://h:443/x — a real
    # non-default endpoint — onto http://h/x)
    host = (
        F.when(scheme == "http", F.regexp_replace(nowww, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(nowww, r":443$", ""))
        .otherwise(nowww)
    )
    raw_path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.regexp_replace(raw_path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # query comes from the PRE-fragment part only (r10 review: a '?'
    # inside the fragment resurrected fragment content into the canonical
    # form this function promises to drop)
    params = F.split(F.regexp_extract(u, r"^[^#]*\?([^#]*)", 1), "&")
    kept = F.array_sort(
        F.filter(
            params,
            lambda p: (F.length(p) > 0) & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(kept, "&")
    canonical = F.when(
        scheme.isin("http", "https") & (host != ""),
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
        ),
    )
    return df.withColumn(out_col, canonical)


def blocklist_filter(
    df: DataFrame,
    blocked: DataFrame,
    domain_col: str = "domain",
) -> DataFrame:
    """Drop rows whose domain appears in a blocklist (C4-style badlist /
    robots-excluded domain removal). The blocklist is dimension-sized by
    nature (thousands to low millions of domains) → broadcast LEFT ANTI
    join: the corpus never shuffles, each executor filters its partitions
    against the broadcast set. `blocked` must expose the same column name."""
    return df.join(F.broadcast(blocked.select(domain_col).distinct()), domain_col, "left_anti")
