"""Web/URL operators: canonicalization, domain rollups, URL-keyed dedup.

Beyond-reference LLM-pipeline surface: crawl-derived corpora key nearly
everything on the URL — dedup by canonical URL is the FIRST dedup pass
in public pipelines (cheaper than any content hash: no text touched),
and per-domain quality rollups drive domain-level filtering.

All pure Catalyst codegen: ``parse_url`` (JVM regex expression) +
string/array builtins — no UDFs, no shuffle until the domain/URL
groupBy, which partial-aggregates map-side. At 100 TB the canonical-URL
dedup is ONE groupBy(url) shuffle carrying (url, min-id) pairs only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tracking parameters stripped during canonicalization (the widely used
# deny-list core: UTM family + click ids)
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid)="


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL:

    - scheme and host lowercased, leading ``www.`` dropped;
    - default-port / fragment removal come free (``parse_url`` components
      exclude them);
    - a single trailing slash on a non-root path is dropped;
    - tracking query params removed, the rest sorted for a stable order;
    ``NULL``-safe: an unparseable URL yields NULL components and the
    expression returns NULL via the protocol/host concat.
    """
    proto = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    host = F.regexp_replace(
        F.lower(F.parse_url(url, F.lit("HOST"))), r"^www\.", "")
    path = F.regexp_replace(
        F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("")),
        r"(.)/$", r"$1")
    q = F.array_join(
        F.array_sort(F.filter(
            F.split(F.coalesce(F.parse_url(url, F.lit("QUERY")),
                               F.lit("")), "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE))), "&")
    return F.concat(
        proto, F.lit("://"), host, path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")))


def domain_of(url: Column) -> Column:
    """Lowercased host without the ``www.`` prefix."""
    return F.regexp_replace(
        F.lower(F.parse_url(url, F.lit("HOST"))), r"^www\.", "")


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """Keep one row per canonical URL (lowest id wins) — the min_by
    aggregate form: ONE shuffle with map-side partial combine, same
    discipline as ``dedup.exact_dedup``."""
    canon = df.withColumn("__curl", canonicalize_url(F.col(url_col)))
    keep = (canon.groupBy("__curl")
            .agg(F.min(F.col(id_col)).alias(id_col)))
    return (keep.select(F.col("__curl").alias("canonical_url"),
                        id_col))


def domain_stats(df: DataFrame, url_col: str = "url",
                 id_col: str = "doc_id",
                 weight_col: str | None = None) -> DataFrame:
    """Per-domain rollup: doc count, distinct canonical URLs, and the
    mean of ``weight_col`` (e.g. a quality score or n_chars) — the input
    to domain-level allow/deny decisions."""
    canon = df.select(
        domain_of(F.col(url_col)).alias("domain"),
        canonicalize_url(F.col(url_col)).alias("curl"),
        *( [F.col(weight_col)] if weight_col else [] ))
    aggs = [F.count("*").alias("n_docs"),
            F.countDistinct("curl").alias("n_urls")]
    if weight_col:
        aggs.append(F.round(F.avg(weight_col), 6).alias("avg_weight"))
    return canon.groupBy("domain").agg(*aggs)


def blocklist_filter(df: DataFrame, url_col: str,
                     blocked_domains: list[str]) -> DataFrame:
    """Domain-blocklist filtering (the C4/CCNet crawl-hygiene pass):
    drop a document when its registrable domain matches a blocklist
    entry EXACTLY or is a subdomain of one (suffix match on a dot
    boundary — 'ads.evil.test' is blocked by 'evil.test', while
    'notevil.test' is not).

    Plan: canonical-domain extraction plus a literal-array `exists()`
    probe — a pure map-side whole-stage-codegen FILTER, no shuffle, no
    join; it composes with scan pushdown like any predicate. This
    in-expression form is right for blocklists up to a few thousand
    entries (the common curated case); a millions-entry blocklist
    becomes a broadcast semi-join on the reversed-domain prefix
    instead — same map-side property, different probe structure.
    Returns the KEPT rows, with the parsed `domain` attached."""
    dom = domain_of(F.col(url_col))
    probe = F.exists(
        F.array(*[F.lit(b.lower()) for b in blocked_domains]),
        lambda b: (dom == b) | dom.endswith(F.concat(F.lit("."), b)))
    return df.withColumn("domain", dom).where(~probe)
