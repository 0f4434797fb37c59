"""URL parse / canonicalize / census / blocklist operators."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from dsci_524_g26_data_validation_spark.operators import urls


def test_parse_urls_components(spark):
    df = spark.createDataFrame(
        [
            Row(url="HTTP://user:pw@WWW.Example.COM:8080/Path/X?a=1&b=2#frag"),
            Row(url="https://sub.shop.co.uk/"),
            Row(url="not a url"),
        ]
    )
    out = {r["url"]: r for r in urls.parse_urls(df, url_col="url").collect()}
    r = out["HTTP://user:pw@WWW.Example.COM:8080/Path/X?a=1&b=2#frag"]
    assert r["scheme"] == "http"
    assert r["host"] == "www.example.com"  # lowercased, userinfo+port stripped
    assert r["port"] == "8080"
    assert r["path"] == "/Path/X"  # path keeps case
    assert r["query"] == "a=1&b=2"
    assert r["fragment"] == "frag"
    assert r["registered_domain"] == "example.com"
    r2 = out["https://sub.shop.co.uk/"]
    assert r2["port"] is None
    assert r2["registered_domain"] == "shop.co.uk"  # multi-label suffix
    r3 = out["not a url"]
    assert r3["scheme"] == "" and r3["host"] == ""


def test_registered_domain_edge_hosts(spark):
    df = spark.createDataFrame(
        [Row(host="localhost"), Row(host=""), Row(host="deep.a.b.example.com")]
    )
    got = {
        r["host"]: r["d"]
        for r in df.select(
            "host", urls.registered_domain_expr("host").alias("d")
        ).collect()
    }
    assert got["localhost"] == "localhost"  # <2 labels pass through
    assert got[""] == ""
    assert got["deep.a.b.example.com"] == "example.com"


def test_canonicalize_url(spark):
    cases = {
        # tracking params dropped, survivors keep order, fragment+userinfo
        # dropped, scheme/host lowercased, default port stripped
        "HTTP://u@WWW.Ex.COM:80/p?utm_source=x&id=1&ref=z&b=2#f":
            "http://www.ex.com/p?id=1&b=2",
        # all params tracking -> no '?'
        "https://ex.com/p?utm_campaign=a": "https://ex.com/p",
        # empty path -> '/', default https port stripped
        "https://Ex.com:443?x=1": "https://ex.com/?x=1",
        # non-default port kept
        "https://ex.com:8443/a": "https://ex.com:8443/a",
        # unparseable strings pass through untouched
        "not a url": "not a url",
    }
    df = spark.createDataFrame([Row(url=u) for u in cases])
    got = {
        r["url"]: r["c"]
        for r in df.select(
            "url", urls.canonicalize_url_expr("url").alias("c")
        ).collect()
    }
    for raw, want in cases.items():
        assert got[raw] == want, f"{raw!r}: {got[raw]!r} != {want!r}"


def test_domain_census_collapses_crawl_variants(spark):
    # 3 raw URLs of the SAME page (utm / fragment / host case variants)
    # + 1 distinct page on the same domain + 1 other domain.
    df = spark.createDataFrame(
        [
            Row(url="https://www.a.com/p?utm_source=x", w=10),
            Row(url="https://WWW.A.com/p#frag", w=10),
            Row(url="https://www.a.com/p", w=10),
            Row(url="https://cdn.a.com/q", w=5),
            Row(url="https://b.co.uk/r", w=1),
        ]
    )
    out = {
        r["registered_domain"]: r
        for r in urls.domain_census(df, url_col="url", weight_col="w").collect()
    }
    a = out["a.com"]
    assert a["n_urls"] == 4
    assert a["n_canonical"] == 2  # 3 variants collapse to 1, plus /q
    assert a["n_hosts"] == 2  # www + cdn
    assert a["total_weight"] == 35
    assert out["b.co.uk"]["n_urls"] == 1


def test_filter_blocked_domains(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, url="https://spamfarm.com/x"),
            Row(doc_id=2, url="https://www.spamfarm.com/y"),
            Row(doc_id=3, url="https://fine.org/z"),
        ]
    )
    blocked = spark.createDataFrame([Row(registered_domain="spamfarm.com")])
    kept = urls.filter_blocked_domains(df, blocked, url_col="url")
    assert [r["doc_id"] for r in kept.collect()] == [3]
    assert kept.columns == df.columns  # helper column dropped


def test_registered_domain_from_psl(spark):
    df = spark.createDataFrame(
        [
            Row(host="a.b.github.io"),
            Row(host="x.example.co.uk"),
            Row(host="weird.zz"),
        ]
    )
    psl = spark.createDataFrame(
        [Row(suffix=s) for s in ("com", "uk", "co.uk", "io", "github.io")]
    )
    got = {
        r["host"]: r["registered_domain"]
        for r in urls.registered_domain_from_psl(df, psl).collect()
    }
    assert got["a.b.github.io"] == "b.github.io"  # longest suffix wins
    assert got["x.example.co.uk"] == "example.co.uk"
    assert got["weird.zz"] == "weird.zz"  # no PSL hit -> heuristic
