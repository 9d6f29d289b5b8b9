"""URL curation family (llm/url.py) — stage 1 of the web-corpus
funnel: RFC 3986 normalization, public-suffix registered-domain
extraction, domain blocklist gate, URL-key exact dedup."""

import pytest
from pyspark.sql import Row

from odibi_spark.llm.url import (
    TRACKING_PARAMS,
    dedup_by_url,
    filter_blocked_domains,
    registered_domain,
    url_normalize,
)


def _urls(spark, urls):
    return spark.createDataFrame(
        [Row(doc_id=i, url=u) for i, u in enumerate(urls)]
    )


def _norm(spark, url):
    return url_normalize(_urls(spark, [url])).first()


class TestUrlNormalize:
    def test_scheme_and_host_lowercased(self, spark):
        r = _norm(spark, "HTTPS://WWW.Example.COM/KeepCase/Path")
        assert r.url == "https://www.example.com/KeepCase/Path"
        assert r.host == "www.example.com"

    def test_default_port_stripped_nondefault_kept(self, spark):
        assert _norm(spark, "http://a.com:80/x").url == "http://a.com/x"
        assert _norm(spark, "https://a.com:443/x").url == "https://a.com/x"
        assert (
            _norm(spark, "https://a.com:8443/x").url
            == "https://a.com:8443/x"
        )
        # 80 is NOT https's default
        assert (
            _norm(spark, "https://a.com:80/x").url == "https://a.com:80/x"
        )

    def test_fragment_stripped(self, spark):
        assert _norm(spark, "http://a.com/x#sec-2").url == "http://a.com/x"

    def test_tracking_params_stripped_order_preserved(self, spark):
        r = _norm(
            spark,
            "http://a.com/x?z=1&utm_source=nl&id=9&fbclid=abc&UTM_Medium=e&a=2",
        )
        assert r.url == "http://a.com/x?z=1&id=9&a=2"

    def test_emptied_query_drops_question_mark(self, spark):
        r = _norm(spark, "http://a.com/x?utm_source=nl&gclid=1")
        assert r.url == "http://a.com/x"

    def test_empty_path_becomes_slash(self, spark):
        assert _norm(spark, "http://A.com").url == "http://a.com/"
        assert _norm(spark, "http://A.com?id=1").url == "http://a.com/?id=1"

    def test_userinfo_preserved(self, spark):
        r = _norm(spark, "ftp://User@Host.ORG/f")
        assert r.url == "ftp://User@host.org/f"

    def test_malformed_untouched_with_null_host(self, spark):
        r = _norm(spark, "  not a url  ")
        assert r.url == "not a url" and r.host is None

    def test_ipv6_literal_host_parsed_intact(self, spark):
        # ADVICE r11: '^([^:]*)' truncated bracketed hosts to '['
        r = _norm(spark, "http://[2001:DB8::1]/x")
        assert r.url == "http://[2001:db8::1]/x"
        assert r.host == "[2001:db8::1]"

    def test_ipv6_literal_with_port(self, spark):
        assert (
            _norm(spark, "http://[2001:db8::1]:8080/x").url
            == "http://[2001:db8::1]:8080/x"
        )
        # default port still stripped for bracketed hosts
        assert (
            _norm(spark, "http://[::1]:80/x").url == "http://[::1]/x"
        )

    def test_all_tracking_names_covered(self, spark):
        q = "&".join(f"{p}=v" for p in TRACKING_PARAMS)
        r = _norm(spark, f"http://a.com/x?{q}&keep=1")
        assert r.url == "http://a.com/x?keep=1"


class TestRegisteredDomain:
    def _reg(self, spark, host):
        df = spark.createDataFrame([Row(host=host)], "host string")
        return registered_domain(df).first().registered_domain

    def test_multi_label_public_suffix(self, spark):
        assert self._reg(spark, "a.b.example.co.uk") == "example.co.uk"
        assert self._reg(spark, "news.site.com.au") == "site.com.au"

    def test_plain_tld(self, spark):
        assert self._reg(spark, "www.example.com") == "example.com"
        assert self._reg(spark, "example.com") == "example.com"

    def test_unknown_tld_psl_star_rule(self, spark):
        assert self._reg(spark, "x.y.example.zz") == "example.zz"

    def test_single_label_null_ip_unchanged(self, spark):
        # PSL-strict: a single-label host is itself a public suffix
        # under the `*` default rule — no registrable domain
        assert self._reg(spark, "localhost") is None
        assert self._reg(spark, "10.0.0.1") == "10.0.0.1"
        assert self._reg(spark, "[2001:db8::1]") == "[2001:db8::1]"

    def test_null_host_stays_null(self, spark):
        assert self._reg(spark, None) is None

    def test_bare_public_suffix_is_null(self, spark):
        # ADVICE r11: a host that IS a listed suffix has no
        # registrable domain — it must not become a rollup key
        assert self._reg(spark, "co.uk") is None
        assert self._reg(spark, "github.io") is None

    def test_private_section_platform_suffixes(self, spark):
        assert self._reg(spark, "alice.github.io") == "alice.github.io"
        assert (
            self._reg(spark, "deep.alice.github.io") == "alice.github.io"
        )
        assert self._reg(spark, "blog.wordpress.com") == "blog.wordpress.com"
        # a plain .io site is NOT conflated with the platform rule
        assert self._reg(spark, "www.example.io") == "example.io"

    def test_wildcard_and_exception_rules(self, spark):
        # *.kawasaki.jp: every label under the base is a suffix
        assert self._reg(spark, "x.sub.kawasaki.jp") == "x.sub.kawasaki.jp"
        # host IS the wildcard suffix -> no registrable domain
        assert self._reg(spark, "sub.kawasaki.jp") is None
        # !city.kawasaki.jp carve-out: the rule itself is registrable
        assert self._reg(spark, "city.kawasaki.jp") == "city.kawasaki.jp"
        assert self._reg(spark, "a.city.kawasaki.jp") == "city.kawasaki.jp"
        assert self._reg(spark, "www.ck") == "www.ck"
        assert self._reg(spark, "shop.acme.ck") == "shop.acme.ck"
        assert self._reg(spark, "acme.ck") is None

    def test_extra_suffixes_extend_snapshot(self, spark):
        from odibi_spark.llm.url import registered_domain_expr
        from pyspark.sql import functions as F

        df = spark.createDataFrame([Row(host="a.example.priv.at")])
        got = df.select(
            registered_domain_expr(
                F.col("host"), extra_suffixes=("priv.at",)
            ).alias("r")
        ).first().r
        assert got == "example.priv.at"


class TestPslRules:
    PSL_TEXT = """\
// ===BEGIN ICANN DOMAINS===
com
co.uk
*.ck
!www.ck
// a comment line
jp
*.kawasaki.jp
!city.kawasaki.jp
// ===END ICANN DOMAINS===
// ===BEGIN PRIVATE DOMAINS===
github.io
blogspot.com
// ===END PRIVATE DOMAINS===
"""

    def test_parse_sections_and_rule_kinds(self):
        from odibi_spark.llm.url import parse_psl

        r = parse_psl(self.PSL_TEXT)
        # single-label exact rules (com, jp) dropped: redundant with *
        assert r.exact == ("blogspot.com", "co.uk", "github.io")
        assert r.wildcards == ("ck", "kawasaki.jp")
        assert r.exceptions == ("city.kawasaki.jp", "www.ck")

    def test_private_section_gate(self):
        from odibi_spark.llm.url import parse_psl

        r = parse_psl(self.PSL_TEXT, include_private=False)
        assert r.exact == ("co.uk",)

    def test_load_psl_and_registered_domain_path(self, spark, tmp_path):
        from odibi_spark.llm.url import registered_domain

        p = tmp_path / "psl.dat"
        p.write_text(self.PSL_TEXT)
        df = spark.createDataFrame(
            [("a.b.example.co.uk",), ("alice.github.io",)], ["host"]
        )
        got = {
            r.host: r.registered_domain
            for r in registered_domain(df, suffixes_path=str(p)).collect()
        }
        assert got == {
            "a.b.example.co.uk": "example.co.uk",
            "alice.github.io": "alice.github.io",
        }


class TestRegisteredDomainLookupPath:
    """The broadcast-join scale path must agree with the regexp
    expression path on every rule class — the differential that lets
    a full 9k-rule PSL file ride the join plan safely."""

    HOSTS = [
        "a.b.example.co.uk", "example.co.uk", "co.uk",
        "www.example.com", "example.com", "localhost",
        "10.0.0.1", "[2001:db8::1]", None,
        "alice.github.io", "deep.alice.github.io", "github.io",
        "x.sub.kawasaki.jp", "sub.kawasaki.jp", "kawasaki.jp",
        "city.kawasaki.jp", "a.city.kawasaki.jp",
        "www.ck", "shop.acme.ck", "acme.ck", "ck",
        "x.y.example.zz", "s3.amazonaws.com", "b.s3.amazonaws.com",
    ]

    def test_lookup_agrees_with_expr(self, spark):
        from odibi_spark.llm.url import (
            default_rules,
            registered_domain,
            registered_domain_lookup,
        )

        rules = default_rules()
        df = spark.createDataFrame(
            [(h,) for h in self.HOSTS], "host string"
        )
        expr_out = {
            r.host: r.registered_domain
            for r in registered_domain(df, rules=rules).collect()
        }
        join_out = {
            r.host: r.registered_domain
            for r in registered_domain_lookup(df, rules=rules).collect()
        }
        assert expr_out == join_out

    def test_dispatch_over_threshold(self, spark):
        from odibi_spark.llm.url import default_rules, registered_domain

        df = spark.createDataFrame([("a.b.example.co.uk",)], ["host"])
        out = registered_domain(
            df, rules=default_rules(), max_regex_rules=1
        )
        assert out.first().registered_domain == "example.co.uk"
        # the join plan leaves no helper columns behind
        assert set(out.columns) == {"host", "registered_domain"}


class TestFilterBlockedDomains:
    def _df(self, spark):
        rows = [
            Row(doc_id=1, registered_domain="spam.com"),
            Row(doc_id=2, registered_domain="good.org"),
            Row(doc_id=3, registered_domain=None),
            Row(doc_id=4, registered_domain="bad.co.uk"),
        ]
        return spark.createDataFrame(
            rows, "doc_id int, registered_domain string"
        )

    def test_literal_predicate_path(self, spark):
        out = filter_blocked_domains(
            self._df(spark), ["Spam.COM", "bad.co.uk"]
        )
        assert sorted(r.doc_id for r in out.collect()) == [2, 3]

    def test_dataframe_broadcast_path(self, spark):
        bl = spark.createDataFrame([("SPAM.com",)], ["d"])
        out = filter_blocked_domains(self._df(spark), bl)
        assert sorted(r.doc_id for r in out.collect()) == [2, 3, 4]

    def test_over_literal_cap_uses_join(self, spark):
        big = [f"junk{i}.com" for i in range(300)] + ["spam.com"]
        out = filter_blocked_domains(self._df(spark), big, max_literal=256)
        assert sorted(r.doc_id for r in out.collect()) == [2, 3, 4]

    def test_null_domain_always_kept(self, spark):
        out = filter_blocked_domains(self._df(spark), ["spam.com"])
        assert 3 in {r.doc_id for r in out.collect()}

    def test_empty_blocklist_is_identity(self, spark):
        assert filter_blocked_domains(self._df(spark), []).count() == 4

    def test_stored_column_keeps_pushdown_literal(self, spark):
        """Stored-column input stays a plain Filter (no join node):
        the NOT-IN literal reaches the scan for row-group skipping."""
        out = filter_blocked_domains(self._df(spark), ["spam.com"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan

    def test_derived_expression_routes_to_antijoin(self, spark):
        """DERIVED domain columns must take the broadcast anti-join:
        a literal filter would substitute the whole derivation into
        the scan predicate (r12: the PSL expression blew the janino
        codegen limit and fell back to interpreted rows — measured
        4x slower at sf0.1)."""
        from odibi_spark.llm.url import registered_domain, url_normalize

        df = spark.createDataFrame(
            [(1, "https://spam.com/x"), (2, "https://good.org/y")],
            "doc_id int, url string",
        )
        reg = registered_domain(
            url_normalize(df, "url", host_col="host"), "host"
        )
        out = filter_blocked_domains(reg, ["spam.com"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "LeftAnti" in plan
        assert [r.doc_id for r in out.collect()] == [2]

    def test_derived_detected_in_wide_projection(self, spark):
        """ADVICE r12: plan toString elides expression lists past
        spark.sql.debug.maxToStringFields (default 25), so the old
        ' AS col#' string probe missed a derived domain hidden in a
        wide projection and re-selected the literal NOT-IN codegen
        trap. The py4j expression walk must see through the elision
        — and still classify stored columns as stored."""
        from pyspark.sql import functions as F

        from odibi_spark.llm.url import _is_derived_column

        wide = self._df(spark).select(
            "doc_id",
            F.upper(F.col("registered_domain")).alias("registered_domain"),
            *[F.lit(i).alias(f"pad_{i}") for i in range(40)],
        )
        assert _is_derived_column(wide, "registered_domain") is True
        out = filter_blocked_domains(wide, ["spam.com"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "LeftAnti" in plan
        # stored column in an equally wide projection stays stored
        stored = self._df(spark).select(
            "doc_id", "registered_domain",
            *[F.lit(i).alias(f"pad_{i}") for i in range(40)],
        )
        assert _is_derived_column(stored, "registered_domain") is False

    def test_paths_result_identical(self, spark):
        """Literal and anti-join paths agree row-for-row (incl. the
        NULL-kept policy) on the same input."""
        df = self._df(spark)
        lit = filter_blocked_domains(df, ["spam.com", "bad.co.uk"])
        bl = spark.createDataFrame(
            [("spam.com",), ("bad.co.uk",)], ["d"]
        )
        joined = filter_blocked_domains(df, bl)
        assert sorted(r.doc_id for r in lit.collect()) == sorted(
            r.doc_id for r in joined.collect()
        )


class TestDedupByUrl:
    def test_lowest_id_survives(self, spark):
        df = spark.createDataFrame([
            Row(doc_id=5, url="http://a.com/"),
            Row(doc_id=2, url="http://a.com/"),
            Row(doc_id=7, url="http://b.com/"),
        ])
        out = dedup_by_url(df)
        assert sorted(r.doc_id for r in out.collect()) == [2, 7]

    def test_partitioning_invariant(self, spark):
        rows = [Row(doc_id=i, url=f"http://s{i % 13}.com/") for i in range(200)]
        df = spark.createDataFrame(rows)
        a = {r.doc_id for r in dedup_by_url(df.repartition(1)).collect()}
        b = {r.doc_id for r in dedup_by_url(df.repartition(17)).collect()}
        assert a == b and len(a) == 13

    def test_full_row_preserved(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, url="http://a.com/", extra="payload")]
        )
        r = dedup_by_url(df).first()
        assert r.extra == "payload" and "__uk" not in df.columns

    def test_null_urls_pass_through_unexamined(self, spark):
        # VERDICT r11 watch item: NULL urls are "no URL", not one
        # shared identity — every NULL-url row must survive
        df = spark.createDataFrame(
            [(1, None), (2, None), (3, "http://a.com/"),
             (4, "http://a.com/")],
            "doc_id int, url string",
        )
        out = dedup_by_url(df)
        assert sorted(r.doc_id for r in out.collect()) == [1, 2, 3]


class TestNormalizeThenDedupPipeline:
    def test_variants_collapse(self, spark):
        """The funnel composition: tracking/case/port variants of one
        page collapse to a single survivor."""
        df = _urls(spark, [
            "https://WWW.Example.com:443/p?id=1&utm_source=a",
            "https://www.example.com/p?id=1",
            "https://www.example.com/p?id=2",
        ])
        out = dedup_by_url(url_normalize(df))
        assert sorted(r.doc_id for r in out.collect()) == [0, 2]


class TestDomainRollup:
    def _df(self, spark):
        rows = [
            Row(registered_domain="a.com", n_chars=100, q=0.8),
            Row(registered_domain="a.com", n_chars=200, q=0.6),
            Row(registered_domain="b.org", n_chars=50, q=0.1),
            Row(registered_domain="lone.io", n_chars=10, q=0.9),
        ]
        return spark.createDataFrame(rows)

    def test_rollup_and_min_docs_floor(self, spark):
        from odibi_spark.llm.url import domain_rollup

        out = {
            r.registered_domain: r
            for r in domain_rollup(
                self._df(spark), size_col="n_chars", quality_col="q",
                min_docs=2,
            ).collect()
        }
        assert set(out) == {"a.com"}  # singletons dropped
        assert out["a.com"].n_docs == 2
        assert out["a.com"].total_size == 300
        assert out["a.com"].mean_quality == pytest.approx(0.7)

    def test_optional_metrics(self, spark):
        from odibi_spark.llm.url import domain_rollup

        out = domain_rollup(self._df(spark))
        assert set(out.columns) == {"registered_domain", "n_docs"}
        assert out.count() == 3

    def test_validation(self, spark):
        from odibi_spark.llm.url import domain_rollup

        with pytest.raises(ValueError, match="min_docs"):
            domain_rollup(self._df(spark), min_docs=0)


class TestUrlNormalizeDifferential:
    """Pure-Python replay of the normalization rules over a seeded
    messy-URL generator — catches expression-staging and escaping
    regressions in the staged column pipeline."""

    @staticmethod
    def _ref(url):
        import re

        from odibi_spark.llm.url import TRACKING_PARAMS

        u = url.strip()
        m = re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*)://", u)
        if not m:
            return u, None
        scheme = m.group(1).lower()
        after = u[m.end():]
        am = re.match(r"^([^/?#]*)", after)
        auth, tail = am.group(1), after[am.end():]
        tail = re.sub(r"#.*$", "", tail, flags=re.S)
        um = re.match(r"^([^@]*)@", auth)
        userinfo = um.group(1) if um else ""
        hostport = auth[um.end():] if um else auth
        host = re.match(r"^(\[[^\]]*\]|[^:]*)", hostport).group(1).lower()
        pm = re.match(r"^(?:\[[^\]]*\]|[^:]*):([0-9]+)$", hostport)
        port = pm.group(1) if pm else ""
        path = re.match(r"^([^?]*)", tail).group(1)
        qm = re.search(r"\?(.*)$", tail, flags=re.S)
        query = qm.group(1) if qm else ""
        if (scheme, port) in (("http", "80"), ("https", "443")):
            port = ""
        keep = [
            p for p in query.split("&")
            if p and not p.split("=", 1)[0].lower().startswith("utm_")
            and p.split("=", 1)[0].lower() not in TRACKING_PARAMS
        ]
        q2 = "&".join(keep)
        path = path or "/"
        return (
            scheme + "://" + (userinfo + "@" if userinfo else "") + host
            + (":" + port if port else "") + path
            + ("?" + q2 if q2 else "")
        ), host

    def test_seeded_messy_urls(self, spark):
        import random

        rng = random.Random(77)
        schemes = ["http", "HTTPS", "ftp", "Http"]
        hosts = ["WWW.Ex.COM", "a.B.co.uk", "X.org", "10.0.0.1",
                 "Sub.Domain.Example.com.au"]
        ports = ["", ":80", ":443", ":8080"]
        paths = ["", "/", "/A/b", "/x%20y"]
        queries = ["", "?id=1", "?utm_source=a&id=2",
                   "?REF=x&q=Z&fbclid=1", "?utm_a=1&utm_b=2"]
        frags = ["", "#f", "#Sec-2"]
        urls = [
            rng.choice(schemes) + "://"
            + (rng.choice(["", "user@"]))
            + rng.choice(hosts) + rng.choice(ports)
            + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
            for _ in range(60)
        ] + ["not a url", "  spaced  "]
        out = url_normalize(_urls(spark, urls))
        got = {r.doc_id: (r.url, r.host) for r in out.collect()}
        for i, u in enumerate(urls):
            assert got[i] == self._ref(u), (u, got[i], self._ref(u))
