"""URL-level curation: canonicalization, URL dedup, per-domain caps.

Web-crawl pretraining pipelines (C4, CCNet, RefinedWeb) run three URL
steps before any content-level dedup: canonicalize each record's URL,
keep one record per canonical URL (crawls re-fetch the same page many
times), and cap how many pages any one registered domain contributes
(a handful of mega-domains otherwise dominate the corpus).

Everything here is built-in string/array expressions — one codegen pass
per row, no UDFs, no shuffle until the keyed aggregation itself:

* ``canonicalize_url``     — pure per-row expression (scan-stage).
* ``registered_domain``    — pure per-row expression (scan-stage).
* ``url_dedup``            — one hash groupBy on the canonical URL with a
  ``max(struct(...))`` keep-best reduction: map-side combine means a URL
  fetched a billion times costs one partial per task, never a
  billion-row group in memory.
* ``domain_cap``           — exact-k per domain ranked by the seeded
  ``hash_uniform`` md5 key (same family as
  :func:`sampling.stratified_top_k_sample`, which ranks by the full md5
  hex string; the two orders agree except on 8-hex-prefix collisions);
  reproducible across engines and partitionings.

Scale notes: canonicalization and domain extraction stay in the scan
stage (predicate/column pruning unaffected). ``url_dedup``'s single
aggregation shuffles only (canon_url, best-struct) pairs after partial
aggregation. ``domain_cap`` sorts within domains, so one mega-domain is
one sort partition — fine for the usual cap≈1e4–1e6 rows/domain; for a
pathological domain holding >~1e8 rows, pre-filter with
``hash_uniform(id) < (margin * cap / approx_count)`` before ranking so
the per-domain sort sees ~cap rows instead of the full domain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solar_data_tools_spark.operators.sampling import hash_uniform

# Exact-match tracking parameter names; any "utm_*" key is also dropped.
TRACKING_PARAMS = ("gclid", "fbclid", "ref", "mc_cid", "mc_eid")

# Common two-level public suffixes for the approximate eTLD+1 below. A
# production system would ship the full Mozilla public-suffix list as a
# broadcast lookup; the expression form keeps the hot path join-free.
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "co.kr", "co.in", "com.br", "com.cn", "com.mx",
)


def _scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def _hostport(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))


def canonical_host(url: Column) -> Column:
    """Lower-cased host with any leading ``www.`` and a scheme-default
    port (``:80`` for http, ``:443`` for https) removed."""
    scheme = _scheme(url)
    host = F.regexp_replace(_hostport(url), r"^www\.", "")
    host = (
        F.when(
            (scheme == "http") & host.endswith(":80"),
            F.substring(host, 1, F.length(host) - 3),
        )
        .when(
            (scheme == "https") & host.endswith(":443"),
            F.substring(host, 1, F.length(host) - 4),
        )
        .otherwise(host)
    )
    return host


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL, as one codegen expression:

    1. scheme and host lower-cased (path/query stay case-sensitive);
    2. leading ``www.`` stripped from the host;
    3. scheme-default port removed (``:80`` http / ``:443`` https);
    4. fragment dropped;
    5. tracking query params dropped (``utm_*`` prefix plus
       :data:`TRACKING_PARAMS`), the survivors sorted lexicographically
       and re-joined — param ORDER never distinguishes two URLs;
    6. trailing ``/`` run dropped from the path (so
       ``…/a/`` == ``…/a`` and a bare host needs no path at all).

    URLs with no parseable ``scheme://`` (protocol-relative ``//host``,
    bare ``host/path``) pass through UNCHANGED — collapsing every
    unparseable record onto one constant would merge them into a single
    dedup group (silent mass data loss downstream).

    Mirrors the DuckDB SQL used by the q123+ oracles step for step.
    """
    scheme = _scheme(url)
    host = canonical_host(url)
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    # ALL trailing slashes, not one: stripping a single '/' from 'a//'
    # leaves 'a/', so canonicalize(canonicalize(u)) != canonicalize(u) —
    # the idempotence property test caught exactly that on '//' paths
    path = F.regexp_replace(path, r"/+$", "")
    # strip the fragment BEFORE extracting the query: a '?' inside the
    # fragment ('/x#sec?b=1', SPA hash-routes) is not a query string
    nofrag = F.regexp_replace(url, r"#.*$", "")
    query = F.regexp_extract(nofrag, r"\?(.*)$", 1)
    params = F.split(query, "&")

    def _keep(p: Column) -> Column:
        key = F.regexp_extract(p, r"^([^=]*)", 1)
        return (
            (p != "")
            & ~key.startswith("utm_")
            & ~key.isin(*TRACKING_PARAMS)
        )

    canon_q = F.array_join(F.array_sort(F.filter(params, _keep)), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", url).otherwise(canon)


def registered_domain(url: Column) -> Column:
    """Approximate eTLD+1 of a URL's host: the last two labels, or the
    last three when the last two form a common two-level public suffix
    (:data:`TWO_LEVEL_SUFFIXES`). ``example.co.uk`` and
    ``a.b.example.com`` both map to their registrable domain; hosts with
    fewer labels pass through unchanged. IPv4-literal hosts are NOT
    dotted names — they pass through whole (label-suffix math would
    merge every host sharing its last two octets into one "domain");
    URLs with no parseable host fall back to the literal URL string, so
    each unparseable record stays its own group."""
    host = canonical_host(url)
    # strip any residual :port before domain math
    host = F.regexp_replace(host, r":[0-9]+$", "")
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    return (
        F.when(host == "", url)
        .when(host.rlike(r"^[0-9.]+$"), host)
        .when(n <= 2, host)
        .when(last2.isin(*TWO_LEVEL_SUFFIXES) & (n >= 3), last3)
        .otherwise(last2)
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    quality_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per canonical URL: the row with the highest
    ``quality_col`` (ties → lowest ``id_col``) survives.

    The reduction is ``min(struct(-quality, id))`` — an ordinary
    aggregate with map-side partials, so duplicate cardinality per URL
    is unbounded without any per-group memory concern (contrast a
    window `row_number`, which sorts every group). Only ``quality_col``
    must be numeric (it is negated to express "highest quality" under a
    min); the tie-break compares ``id_col`` directly, so ids can be any
    orderable type — numeric row ids, WARC record ids, UUID strings.

    Returns (canon_url, n_dups, kept ``id_col``, kept ``quality_col``).
    """
    canon = df.withColumn("canon_url", canonicalize_url(F.col(url_col)))
    best = F.min(
        F.struct(
            (-F.col(quality_col)).alias("neg_q"),
            F.col(id_col).alias("id"),
        )
    ).alias("best")
    out = canon.groupBy("canon_url").agg(
        F.count(F.lit(1)).alias("n_dups"), best
    )
    return out.select(
        "canon_url",
        "n_dups",
        F.col("best.id").alias(id_col),
        (-F.col("best.neg_q")).alias(quality_col),
    )


def domain_cap(
    df: DataFrame,
    cap: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    seed: int | str = 0,
    prefilter_margin: float | None = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per registered domain, chosen by the
    seeded md5 order (``hash_uniform``) with ``id_col`` as tie-break —
    an unbiased, engine-reproducible uniform pick, identical however
    the input is partitioned.

    Adds a ``domain`` column. Rows whose URL yields no parseable host
    group under their literal host string (still capped).

    **Mega-domain path** (``prefilter_margin``, e.g. ``2.0``): the
    per-domain ``row_number`` sort sees every row of its domain, so one
    domain holding 10⁸ pages is one 10⁸-row sort partition. With a
    margin set, a per-domain count (tiny aggregate) joins back on the
    SAME domain partitioning and rows of over-cap domains are
    pre-filtered to ``hash < margin*cap/n_domain`` BEFORE the rank —
    the sort then sees ~margin*cap rows per domain instead of n_domain.
    Because the prefilter keeps a superset of the hash-smallest ``cap``
    rows whenever ≥cap rows survive, the result is IDENTICAL to the
    exact path unless the binomial survivor count dips below ``cap``
    (P < exp(-cap·(1−1/margin)²/2) per domain by Chernoff; under-cap
    domains skip the prefilter entirely, so they are never at risk).

    **The bound is cap-dependent**: the exponent is cap·(1−1/margin)²/2,
    so ~1e-27 at cap=1000/margin=2 but ~8% at cap=20/margin=2 — small
    caps with a thin margin can silently under-fill over-cap domains.
    When the per-domain divergence bound exceeds ~1e-9 (exponent < 20)
    this function emits a ``UserWarning`` telling you the margin (or
    cap) needed to restore the guarantee; pass a larger
    ``prefilter_margin`` or drop the prefilter for small caps.
    """
    import math
    import warnings

    from pyspark.sql import Window

    d = df.withColumn("domain", registered_domain(F.col(url_col)))
    u = hash_uniform(F.col(id_col), seed)
    if prefilter_margin is not None:
        if prefilter_margin <= 1.0:
            raise ValueError("prefilter_margin must be > 1")
        exponent = cap * (1.0 - 1.0 / prefilter_margin) ** 2 / 2.0
        if exponent < 20.0:
            # margin needed for a 1e-9 per-domain bound at this cap
            need = 1.0 / (1.0 - math.sqrt(2.0 * 20.0 / cap)) if cap > 40 else None
            hint = (
                f"use prefilter_margin >= {need:.2f}"
                if need
                else "this cap is too small for any margin; drop the prefilter"
            )
            warnings.warn(
                f"domain_cap prefilter divergence bound is exp(-{exponent:.2f})"
                f" ≈ {math.exp(-exponent):.2e} per over-cap domain at cap="
                f"{cap}, margin={prefilter_margin} — the 'identical to exact'"
                f" guarantee is weak; {hint}",
                UserWarning,
                stacklevel=2,
            )
        counts = d.groupBy("domain").agg(F.count(F.lit(1)).alias("_nd"))
        # plain (non-broadcast) join: co-partitions by domain, the same
        # distribution the window needs — one shuffle of the big side
        d = d.join(counts, on="domain").where(
            (F.col("_nd") <= F.lit(float(prefilter_margin * cap)))
            | (u < F.lit(float(prefilter_margin * cap)) / F.col("_nd"))
        ).drop("_nd")
    w = Window.partitionBy("domain").orderBy(u, F.col(id_col))
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)
        .drop("_rn")
    )


def host_suffixes(url: Column) -> Column:
    """All dot-suffixes of a URL's canonical host (port stripped):
    ``a.b.example.com`` → [a.b.example.com, b.example.com, example.com,
    com]. This is the exact-match set for domain blocklists (UT1 /
    URLhaus style): one list entry blocks the host itself AND every
    subdomain, with no regex scans. Pure codegen — one split + one
    higher-order transform per row, no shuffle."""
    host = F.regexp_replace(canonical_host(url), r":[0-9]+$", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n - i + F.lit(1)), "."),
    )


def blocklist_mark(
    df: DataFrame,
    blocked_domains: list[str],
    url_col: str = "url",
) -> DataFrame:
    """Mark rows whose host (or ANY parent domain of it) appears in a
    domain blocklist — the adult/malware/spam domain filter every
    web-crawl curation pipeline runs first (C4 used a banned-word list,
    CCNet/RefinedWeb use UT1-style domain lists).

    The blocklist ships as ONE array literal (lower-cased, de-dotted of
    leading ``www.``), so the verdict is ``arrays_overlap(suffixes,
    blocklist)`` — a zero-shuffle codegen projection, stream-legal at
    ingest time. Right-sized for lists up to the low-10^5 range; for a
    multi-million-entry list use :func:`blocklist_filter_join`, which
    broadcasts the list as a table instead of inlining it in the plan.

    Adds ``host`` and ``blocked`` columns.
    """
    bl = sorted({d.lower().lstrip(".").removeprefix("www.")
                 for d in blocked_domains})
    if not bl:
        raise ValueError("blocked_domains must be non-empty")
    host = F.regexp_replace(canonical_host(F.col(url_col)), r":[0-9]+$", "")
    return df.withColumn("host", host).withColumn(
        "blocked",
        F.arrays_overlap(host_suffixes(F.col(url_col)), F.lit(bl)),
    )


def blocklist_filter(
    df: DataFrame,
    blocked_domains: list[str],
    url_col: str = "url",
) -> DataFrame:
    """Drop rows matched by :func:`blocklist_mark` (same columns as the
    input)."""
    marked = blocklist_mark(df, blocked_domains, url_col)
    return marked.where(~F.col("blocked")).drop("host", "blocked")


def blocklist_filter_join(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    domain_col: str = "domain",
) -> DataFrame:
    """Blocklist filtering for multi-million-entry lists (full UT1 is
    ~4M domains — too large for a plan literal, easily broadcast as a
    table): explode each row's host-suffix set, broadcast LEFT SEMI join
    against the blocklist to find blocked ids (map-side, no shuffle),
    then anti-join the corpus by id. The only shuffle is the id
    anti-join, and AQE converts it to a broadcast join whenever the
    blocked-id set is small — the common case.

    ``blocklist[domain_col]`` entries match exactly like the literal
    variant: the host itself or any parent domain.
    """
    bl = blocklist.select(
        F.regexp_replace(F.lower(F.col(domain_col)), r"^www\.", "")
        .alias("_bd")
    ).distinct()
    blocked_ids = (
        df.select(
            F.col(id_col),
            F.explode(host_suffixes(F.col(url_col))).alias("_bd"),
        )
        .join(F.broadcast(bl), "_bd", "left_semi")
        .select(id_col)
        .distinct()
    )
    return df.join(blocked_ids, id_col, "left_anti")
