"""Round-9 operators: key-skew profiling, URL canonicalization +
URL-keyed dedup, and domain-capped sampling.

Same discipline as test_round6/7/8_ops: every operator is checked against
an independent pure-Python re-implementation of its contract, and the URL
SQL mirrors (the oracle path) are swept against DuckDB on adversarial
inputs so cross-engine parity is a tested fact, not a hope.
"""
import pytest
from pyspark.sql import functions as F


# -------------------------------------------------------------- skew_profile
class TestSkewProfile:
    def _df(self, spark):
        rows = (
            [("hot", i) for i in range(60)]
            + [("warm", i) for i in range(30)]
            + [(k, i) for k in ("a", "b", "c") for i in range(2)]
            + [(None, 0)] * 4
        )
        return spark.createDataFrame(rows, "k string, v bigint")

    def test_profile_values(self, spark):
        from flatbread_spark.operators.skew import skew_profile

        out = skew_profile(self._df(spark), ["k"], top_k=3).collect()
        assert [r["key"] for r in out] == ["hot", "warm", "<NULL>"]
        assert [r["n"] for r in out] == [60, 30, 4]
        total, nkeys = 100, 6
        assert all(r["n_rows"] == total and r["n_keys"] == nkeys for r in out)
        assert [r["share_ppm"] for r in out] == [600000, 300000, 40000]
        assert [r["cum_share_ppm"] for r in out] == [600000, 900000, 940000]
        # hot key is 60 rows vs a 100/6 mean -> floor(60*6/100) = 3
        assert [r["skew_x"] for r in out] == [3, 1, 0]
        assert [r["rank"] for r in out] == [1, 2, 3]

    def test_tie_break_by_key(self, spark):
        from flatbread_spark.operators.skew import skew_profile

        df = spark.createDataFrame(
            [("b", 1), ("a", 1), ("b", 2), ("a", 2)], "k string, v bigint"
        )
        out = skew_profile(df, ["k"], top_k=2).collect()
        assert [r["key"] for r in out] == ["a", "b"]

    def test_multi_column_key(self, spark):
        from flatbread_spark.operators.skew import skew_profile

        df = spark.createDataFrame(
            [("x", 1), ("x", 1), ("x", 2)], "a string, b bigint"
        )
        out = skew_profile(df, ["a", "b"], top_k=1).collect()
        assert out[0]["key"] == "x\x1f1" and out[0]["n"] == 2


# ------------------------------------------------------ URL canonicalization
ADVERSARIAL_URLS = [
    "HTTP://WWW.Example.COM:80/Path/To/?utm_source=feed&b=2&a=1#frag",
    "https://blog.example.co.uk:443/post/77?z=1&a=2",
    "https://example.com",
    "https://example.com/",
    "https://example.com//",
    "http://example.com:8080/x",
    "http://example.com:80/x?",
    "https://www.sub.Example.org/A/B/C/?fbclid=x",
    "http://single/x",
    "https://a.b.co.uk/q?utm_campaign=x&utm_medium=y",
    "http://host/p?&&a=1&",
    "ftp://Files.Example.com/pub/",
    "not a url at all",
    "https://example.com/UPPER/case?B=2&A=1",
    "http://www.example.com./trail",
]


def _py_canonical(u):
    """Independent reference implementation (stdlib urllib-free on purpose
    — re-deriving the rules, not re-using either engine)."""
    import re

    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", u)
    scheme = m.group(1).lower() if m else ""
    m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", u)
    hostport = m.group(1).lower() if m else ""
    host = re.sub(r":[0-9]*$", "", hostport)
    host = re.sub(r"^www\.", "", host)
    pm = re.search(r":([0-9]+)$", re.match(
        r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", u).group(1)) if m else None
    port = pm.group(1) if pm else ""
    if (scheme, port) in (("http", "80"), ("https", "443")):
        port = ""
    pmatch = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", u)
    path = re.sub("/+$", "", pmatch.group(1)) if pmatch else ""
    path = path or "/"
    qmatch = re.search(r"\?([^#]*)", u)
    parts = (qmatch.group(1) if qmatch else "").split("&")
    kept = sorted(
        p for p in parts
        if p and not re.match(
            r"^(utm_[a-z0-9_]+|gclid|fbclid|msclkid|mc_cid|mc_eid|igshid)=", p
        )
    )
    q = "&".join(kept)
    return (
        scheme + "://" + host + (":" + port if port else "") + path
        + ("?" + q if q else "")
    )


class TestCanonicalUrl:
    def test_against_reference_impl(self, spark):
        from flatbread_spark.functions.urls import canonical_url

        df = spark.createDataFrame([(u,) for u in ADVERSARIAL_URLS], "u string")
        got = {
            r["u"]: r["c"]
            for r in df.select("u", canonical_url(F.col("u")).alias("c")).collect()
        }
        for u in ADVERSARIAL_URLS:
            assert got[u] == _py_canonical(u), u

    def test_sql_mirror_matches_duckdb(self, spark):
        """The oracle path: DuckDB evaluating canonical_url_sql must equal
        Spark evaluating canonical_url, byte for byte."""
        duckdb = pytest.importorskip("duckdb")
        from flatbread_spark.functions.urls import canonical_url, canonical_url_sql

        df = spark.createDataFrame([(u,) for u in ADVERSARIAL_URLS], "u string")
        spark_side = [
            r["c"]
            for r in df.select(canonical_url(F.col("u")).alias("c"))
            .orderBy("c")
            .collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE urls AS SELECT * FROM (VALUES "
            + ", ".join("(?)" for _ in ADVERSARIAL_URLS)
            + ") t(u)",
            ADVERSARIAL_URLS,
        )
        duck_side = [
            r[0]
            for r in con.execute(
                f"SELECT {canonical_url_sql('u')} AS c FROM urls ORDER BY c"
            ).fetchall()
        ]
        assert spark_side == duck_side

    def test_registered_domain(self, spark):
        from flatbread_spark.functions.urls import registered_domain

        cases = {
            "a.b.example.com": "example.com",
            "example.com": "example.com",
            "blog.example.co.uk": "example.co.uk",
            "example.co.uk": "example.co.uk",
            "localhost": "localhost",
            "deep.a.b.com.au": "b.com.au",
        }
        df = spark.createDataFrame([(h,) for h in cases], "h string")
        got = {
            r["h"]: r["d"]
            for r in df.select(
                "h", registered_domain(F.col("h")).alias("d")
            ).collect()
        }
        assert got == cases

    def test_registered_domain_sql_mirror(self, spark):
        duckdb = pytest.importorskip("duckdb")
        from flatbread_spark.functions.urls import (
            registered_domain,
            registered_domain_sql,
        )

        hosts = [
            "a.b.example.com", "example.com", "blog.example.co.uk",
            "localhost", "deep.a.b.com.au", "x.org.uk",
        ]
        df = spark.createDataFrame([(h,) for h in hosts], "h string")
        spark_side = sorted(
            r["d"]
            for r in df.select(registered_domain(F.col("h")).alias("d")).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE hosts AS SELECT * FROM (VALUES "
            + ", ".join("(?)" for _ in hosts) + ") t(h)",
            hosts,
        )
        duck_side = sorted(
            r[0]
            for r in con.execute(
                f"SELECT {registered_domain_sql('h')} AS d FROM hosts"
            ).fetchall()
        )
        assert spark_side == duck_side


# -------------------------------------------------------------- dedup_by_url
class TestDedupByUrl:
    def test_winner_rule(self, spark):
        from flatbread_spark.functions.urls import dedup_by_url

        rows = [
            # three spellings of one page; quality picks id=2, NOT lowest id
            ("https://EXAMPLE.com/a/?utm_source=x", 1, 10),
            ("https://example.com:443/a", 2, 99),
            ("https://www.example.com/a/", 3, 50),
            # quality tie -> smallest id wins
            ("http://t.com/x?b=1&a=1", 4, 7),
            ("http://t.com/x?a=1&b=1", 5, 7),
            # singleton
            ("https://solo.org/p", 6, 1),
        ]
        df = spark.createDataFrame(rows, "url string, doc_id bigint, q bigint")
        out = {
            r["url_canonical"]: (r["doc_id"], r["q"], r["n_dups"])
            for r in dedup_by_url(df, "url", "doc_id", "q").collect()
        }
        assert out["https://example.com/a"] == (2, 99, 3)
        assert out["http://t.com/x?a=1&b=1"] == (4, 7, 2)
        assert out["https://solo.org/p"] == (6, 1, 1)
        assert len(out) == 3


# ------------------------------------------------------- sample_domain_capped
class TestDomainCappedSampling:
    def _df(self, spark):
        # domain "big" has 80% of rows; cap at 30%
        rows = [(f"k{i}", "big") for i in range(160)] + [
            (f"s{i}", "small") for i in range(40)
        ]
        return spark.createDataFrame(rows, "k string, d string")

    def test_cap_enforced_and_threshold_exact(self, spark):
        from flatbread_spark.operators.sampling import sample_domain_capped

        df = self._df(spark)
        out = sample_domain_capped(df, "k", "d", cap_ppm=300_000)
        rows = out.collect()
        # threshold for big = floor(300000 * 200 / 160) = 375000;
        # small is under the cap -> full 1e6
        thr = {r["d"]: r["keep_threshold_ppm"] for r in rows}
        assert thr["big"] == 375_000
        assert thr["small"] == 1_000_000
        kept_small = sum(1 for r in rows if r["d"] == "small")
        assert kept_small == 40  # under-cap domain untouched
        kept_big = sum(1 for r in rows if r["d"] == "big")
        assert 0 < kept_big < 160  # oversized domain actually sampled

    def test_deterministic_under_repartition(self, spark):
        from flatbread_spark.operators.sampling import sample_domain_capped

        df = self._df(spark)
        a = {
            r["k"]
            for r in sample_domain_capped(df, "k", "d", 300_000).collect()
        }
        b = {
            r["k"]
            for r in sample_domain_capped(
                df.repartition(7, "d"), "k", "d", 300_000
            ).collect()
        }
        assert a == b

    def test_matches_pure_python(self, spark):
        """Independent replay: md5-bucket every key in Python and apply the
        same integer threshold."""
        import hashlib

        from flatbread_spark.operators.sampling import sample_domain_capped

        df = self._df(spark)
        got = {
            r["k"] for r in sample_domain_capped(df, "k", "d", 300_000).collect()
        }
        def bucket(k):
            return int(hashlib.md5(k.encode()).hexdigest()[:15], 16) % 1_000_000

        expect = {f"s{i}" for i in range(40)} | {
            f"k{i}" for i in range(160) if bucket(f"k{i}") < 375_000
        }
        assert got == expect

    def test_cap_validation(self, spark):
        from flatbread_spark.operators.sampling import sample_domain_capped

        with pytest.raises(ValueError):
            sample_domain_capped(self._df(spark), "k", "d", 0)
