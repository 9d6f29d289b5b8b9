"""URL curation — stage 1 of every web-corpus pipeline (CCNet,
RefinedWeb, and C4 all gate on the URL before ever looking at
content):

- :func:`url_normalize` — canonicalize scheme/host case, strip the
  default port, the fragment, and tracking query parameters
  (RFC 3986 syntax-based normalization plus the industry tracking-
  param scrub).
- :func:`registered_domain` — the "example.co.uk of
  a.b.example.co.uk" extraction against a static public-suffix
  snapshot (publicsuffix.org's algorithm: longest matching suffix
  plus one label; unknown TLDs fall back to the PSL ``*`` rule).
- :func:`filter_blocked_domains` — blocklist gate on the registered
  domain (broadcast anti-join / literal predicate, plan-size-gated
  like the other small-side joins here).
- :func:`dedup_by_url` — exact URL-key dedup (first doc per
  normalized URL wins), the cheapest dedup pass in the funnel.
- :func:`domain_rollup` — per-registered-domain reputation stats
  (doc count / size / mean quality), the feedback loop into the next
  crawl's blocklist.

Everything is pure whole-stage-codegen column expressions
(regexp_extract / higher-order filter on the split query) — no UDFs,
no shuffle except the dedup groupBy and the anti-join, both on keys.
A DuckDB oracle replays every rule with the same RE2-compatible
patterns (workloads/llmdata.py ``url_normalize_docs`` /
``domain_filter_docs``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Frozen tracking-parameter scrub list (the cross-site redirect
# trackers every major pipeline strips; utm_* is matched by prefix).
# Extend per deployment via the `tracking_params` argument.
TRACKING_PARAMS = (
    "gclid", "fbclid", "msclkid", "dclid", "gbraid", "wbraid",
    "yclid", "twclid", "igshid", "mc_cid", "mc_eid", "mkt_tok",
    "ref", "ref_src", "spm", "_hsenc", "_hsmi", "s_cid", "vero_id",
)

# Static snapshot of MULTI-LABEL public suffixes (publicsuffix.org;
# single-label TLDs need no listing — the PSL "*" default rule makes
# any unknown last label a suffix, i.e. registered = last two
# labels). Production deployments with exotic domains should pass the
# full PSL via `extra_suffixes`; this snapshot covers the multi-label
# families that dominate web corpora.
PUBLIC_SUFFIX_SNAPSHOT = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "co.jp", "ne.jp", "or.jp", "go.jp", "ac.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz",
    "co.in", "net.in", "org.in", "ac.in", "gov.in",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.mx", "com.ar", "com.co", "com.pe", "com.ve",
    "com.sg", "com.my", "com.ph", "com.vn", "co.th", "co.id",
    "com.tr", "com.tw", "co.kr", "or.kr", "com.hk",
    "co.za", "org.za", "co.il", "org.il", "com.eg", "com.sa",
    "com.pk", "com.ng", "co.ke", "com.ua", "com.pl",
)


def _clean_query(query: Column, tracking: tuple[str, ...]) -> Column:
    """Drop tracking parameters from a raw query string; surviving
    params keep their original order (sorting would break servers
    that are order-sensitive, and order-preserving is what the DuckDB
    list_filter twin replays)."""
    parts = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.lower(F.split_part(p, F.lit("="), F.lit(1))).isin(
            *[F.lit(x) for x in tracking]
        )
        & ~F.lower(F.split_part(p, F.lit("="), F.lit(1))).startswith(
            "utm_"
        ),
    )
    return F.array_join(parts, "&")


def url_normalize(
    df: DataFrame,
    url_col: str = "url",
    out_col: str | None = None,
    *,
    host_col: str | None = "host",
    strip_fragment: bool = True,
    tracking_params: tuple[str, ...] = TRACKING_PARAMS,
) -> DataFrame:
    """Canonicalize a URL column: lowercase scheme + host, strip the
    scheme's default port (http:80 / https:443), the ``#fragment``
    (optional), and tracking query parameters (``utm_*`` prefix plus
    the :data:`TRACKING_PARAMS` names); an empty path becomes ``/``
    and an emptied query drops its ``?``. Rows without a
    ``scheme://`` are returned trimmed but otherwise untouched with a
    NULL host — flagging, not guessing (C4 drops them; that is the
    caller's policy via the host column).

    Adds ``out_col`` (default: replaces ``url_col``) and, when
    ``host_col`` is set, the lowercased host for downstream domain
    ops. All whole-stage-codegen expressions; zero shuffle.
    """
    if not strip_fragment:
        raise NotImplementedError(
            "fragment-preserving normalization is not implemented: "
            "every supported pipeline strips fragments (RFC 3986 "
            "fragments are client-side only)"
        )
    out_col = out_col or url_col
    # Stage the decomposition through REAL projected columns: each
    # regexp part is referenced several times below, and inlining one
    # giant expression tree duplicates every non-cheap subtree per
    # reference (measured: an 11 MiB task binary and ~2x wall time on
    # the workload twin before staging — the word_shingles lesson at
    # the expression level). CollapseProject keeps these as separate
    # projections because the aliases are non-cheap and multiply
    # referenced.
    staged = (
        df.withColumn("__u", F.trim(F.col(url_col)))
        .withColumns(
            {
                "__scheme": F.lower(
                    F.regexp_extract(
                        F.col("__u"), r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1
                    )
                ),
                "__after": F.regexp_replace(
                    F.col("__u"), r"^[A-Za-z][A-Za-z0-9+.\-]*://", ""
                ),
            }
        )
        .withColumns(
            {
                "__auth": F.regexp_extract(F.col("__after"), r"^([^/?#]*)", 1),
                "__tail": F.regexp_replace(F.col("__after"), r"^[^/?#]*", ""),
            }
        )
        .withColumns(
            {
                "__nofrag": F.regexp_replace(F.col("__tail"), r"#.*$", ""),
                "__userinfo": F.regexp_extract(
                    F.col("__auth"), r"^([^@]*)@", 1
                ),
                "__hostport": F.regexp_replace(
                    F.col("__auth"), r"^[^@]*@", ""
                ),
            }
        )
        .withColumns(
            {
                "__host": F.lower(
                    F.regexp_extract(F.col("__hostport"), r"^([^:]*)", 1)
                ),
                "__port": F.regexp_extract(
                    F.col("__hostport"), r":([0-9]+)$", 1
                ),
                "__path": F.regexp_extract(F.col("__nofrag"), r"^([^?]*)", 1),
                "__query": F.regexp_extract(
                    F.col("__nofrag"), r"\?(.*)$", 1
                ),
            }
        )
        .drop("__after", "__auth", "__tail", "__nofrag", "__hostport")
    )
    default_port = (
        (F.col("__scheme") == "http") & (F.col("__port") == "80")
    ) | ((F.col("__scheme") == "https") & (F.col("__port") == "443"))
    staged = staged.withColumns(
        {
            "__port2": F.when(default_port, F.lit("")).otherwise(
                F.col("__port")
            ),
            "__query2": _clean_query(F.col("__query"), tracking_params),
            "__path2": F.when(F.col("__path") == "", F.lit("/")).otherwise(
                F.col("__path")
            ),
        }
    )
    rebuilt = F.concat(
        F.col("__scheme"),
        F.lit("://"),
        F.when(F.col("__userinfo") == "", F.lit("")).otherwise(
            F.concat(F.col("__userinfo"), F.lit("@"))
        ),
        F.col("__host"),
        F.when(F.col("__port2") == "", F.lit("")).otherwise(
            F.concat(F.lit(":"), F.col("__port2"))
        ),
        F.col("__path2"),
        F.when(F.col("__query2") == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), F.col("__query2"))
        ),
    )
    valid = F.col("__scheme") != ""
    out = staged.withColumn(
        out_col, F.when(valid, rebuilt).otherwise(F.col("__u"))
    )
    if host_col:
        out = out.withColumn(host_col, F.when(valid, F.col("__host")))
    return out.drop(
        "__u", "__scheme", "__userinfo", "__host", "__port", "__path",
        "__query", "__port2", "__query2", "__path2",
    )


def suffix_alternation(extra_suffixes: tuple[str, ...] = ()) -> str:
    """RE2-compatible alternation of the multi-label suffix snapshot,
    longest-first — shared by :func:`registered_domain_expr` and the
    DuckDB oracle twins so the two engines can never disagree on the
    suffix set."""
    multi = sorted(
        set(PUBLIC_SUFFIX_SNAPSHOT) | set(extra_suffixes),
        key=lambda s: (-s.count("."), s),  # longest suffixes first
    )
    return "|".join(s.replace(".", r"\.") for s in multi)


def registered_domain_expr(
    host: Column,
    *,
    extra_suffixes: tuple[str, ...] = (),
) -> Column:
    """Registered-domain column expression from a lowercased host:
    longest matching public suffix (multi-label snapshot + PSL ``*``
    rule for the last label) plus one label. IP-literal hosts and
    single-label hosts come back unchanged."""
    alt = suffix_alternation(extra_suffixes)
    ip = host.rlike(r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$")
    from_multi = F.regexp_extract(host, rf"([^.]+\.(?:{alt}))$", 1)
    from_two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(host.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(ip, host).otherwise(
            F.coalesce(
                F.nullif(from_multi, F.lit("")),
                F.nullif(from_two, F.lit("")),
                host,
            )
        )
    )


def registered_domain(
    df: DataFrame,
    host_col: str = "host",
    out_col: str = "registered_domain",
    *,
    extra_suffixes: tuple[str, ...] = (),
) -> DataFrame:
    """Add the registered (pay-level) domain for each host — the
    aggregation/blocklist key every URL pipeline groups on."""
    return df.withColumn(
        out_col, registered_domain_expr(F.col(host_col),
                                        extra_suffixes=extra_suffixes)
    )


def filter_blocked_domains(
    df: DataFrame,
    blocklist,
    *,
    domain_col: str = "registered_domain",
    max_literal: int = 256,
) -> DataFrame:
    """Drop rows whose registered domain is blocklisted. ``blocklist``
    is a Python sequence of domains (<= ``max_literal`` entries stay a
    pushed-down NOT-IN literal predicate — zero plan nodes) or a
    1-column DataFrame (broadcast left-anti join; the blocklist is the
    small dimension by construction, so the corpus never shuffles).
    NULL domains (malformed URLs) are KEPT — blocking them is a
    separate validity policy, not a blocklist decision."""
    if isinstance(blocklist, DataFrame):
        bl = blocklist.toDF(domain_col).select(
            F.lower(F.col(domain_col)).alias(domain_col)
        )
        return df.join(F.broadcast(bl), domain_col, "left_anti")
    domains = sorted({str(d).lower() for d in blocklist})
    if not domains:
        return df
    if len(domains) > max_literal:
        bl = df.sparkSession.createDataFrame(
            [(d,) for d in domains], [domain_col]
        )
        return df.join(F.broadcast(bl), domain_col, "left_anti")
    return df.filter(
        ~F.col(domain_col).isin(domains) | F.col(domain_col).isNull()
    )


def dedup_by_url(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """Exact URL-key dedup: the lowest ``id_col`` per URL survives
    (deterministic keeper — reruns and repartitionings agree). The
    URL should already be normalized (:func:`url_normalize`), so
    tracking-param and case variants of one page collapse first.

    Plan: ONE hash-partitioned window over the md5 URL key (the
    ``dedup_exact`` idiom) — the rows shuffle exactly once. A
    groupBy-min + semi-join-back shape was measured and rejected: the
    keeper set is O(distinct URLs), far above broadcast size at
    corpus scale, so the join would shuffle the wide side a second
    time for nothing.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("__uk").orderBy(id_col)
    return (
        df.withColumn("__uk", F.md5(F.col(url_col)))
        .withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .drop("__uk", "__rn")
    )


def domain_rollup(
    df: DataFrame,
    *,
    domain_col: str = "registered_domain",
    size_col: str | None = None,
    quality_col: str | None = None,
    min_docs: int = 1,
) -> DataFrame:
    """Per-registered-domain reputation aggregate — the RefinedWeb-
    style domain-level statistics pass that turns row-level quality
    signals into the NEXT crawl's blocklist/allowlist: doc count,
    total size, and mean quality per domain, dropping domains below
    ``min_docs`` (too few observations to judge).

    ONE map-side-combined groupBy on the domain key; the mean folds
    the quality column through DECIMAL(38,6) (exact, order-
    independent) before a single double division, so the report
    hash-matches cross-engine. Output is O(domains) — feed it to
    :func:`filter_blocked_domains` for the feedback loop."""
    if min_docs < 1:
        raise ValueError("min_docs must be >= 1")
    n = F.count(F.lit(1))
    aggs = [n.cast("long").alias("n_docs")]
    if size_col:
        aggs.append(F.sum(size_col).cast("long").alias("total_size"))
    if quality_col:
        aggs.append(
            (
                F.sum(F.col(quality_col).cast("decimal(38,6)"))
                .cast("double") / n
            ).alias("mean_quality")
        )
    return (
        df.groupBy(domain_col)
        .agg(*aggs)
        .filter(F.col("n_docs") >= int(min_docs))
    )
