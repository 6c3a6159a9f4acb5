"""URL canonicalization (X7), name splitting (X2/X4/X5), and xxhash64
parity between the pure-Python oracle and Spark's F.xxhash64."""

from __future__ import annotations

import pytest

from don_crawler_spark.functions.hashing import xxhash64_bytes, xxhash64_str
from don_crawler_spark.functions.urls import (
    canonicalize_url,
    url_host,
    url_path,
)


def test_xxhash64_spec_vectors() -> None:
    # Published xxHash reference vectors (seed 0)
    assert xxhash64_bytes(b"", 0) & ((1 << 64) - 1) == 0xEF46DB3751D8E999
    assert xxhash64_bytes(b"a", 0) & ((1 << 64) - 1) == 0xD24EC4F1A98C6E5B


def test_xxhash64_matches_spark(spark) -> None:
    from pyspark.sql import functions as F

    tests = [
        "",
        "a",
        "https://example.org/repo/x?a=1",
        "x" * 7,
        "y" * 8,
        "z" * 31,
        "w" * 32,
        "m" * 33,
        "q" * 100,
        "ünïcødé/路径",
    ]
    df = spark.createDataFrame([(t,) for t in tests], ["s"]).select(
        "s", F.xxhash64("s").alias("h")
    )
    got = {r["s"]: r["h"] for r in df.collect()}
    for t in tests:
        assert xxhash64_str(t) == got[t], t


CANON_CASES = [
    ("HTTP://Example.ORG/Path/", "http://example.org/Path"),
    ("https://example.org:443/x", "https://example.org/x"),
    ("http://example.org:80/x", "http://example.org/x"),
    ("http://example.org:8080/x", "http://example.org:8080/x"),
    ("https://example.org/x#frag", "https://example.org/x"),
    ("https://example.org/x?b=2&a=1", "https://example.org/x?a=1&b=2"),
    ("https://example.org/", "https://example.org"),
    ("https://example.org", "https://example.org"),
    ("https://user:pw@example.org/x", "https://example.org/x"),
    ("https://example.org/a/b///", "https://example.org/a/b"),
]


@pytest.mark.parametrize("raw,want", CANON_CASES)
def test_canonicalize(raw: str, want: str) -> None:
    assert canonicalize_url(raw) == want
    # idempotent
    assert canonicalize_url(want) == want


def test_canonicalize_relative() -> None:
    base = "https://example.org/dir/page"
    assert canonicalize_url("sub/x", base) == "https://example.org/dir/sub/x"
    assert canonicalize_url("/abs", base) == "https://example.org/abs"
    assert canonicalize_url("//other.org/y", base) == "https://other.org/y"


def test_host_path() -> None:
    assert url_host("https://example.org/a/b") == "example.org"
    assert url_host("https://example.org:8080/a") == "example.org"
    assert url_path("https://example.org/a/b") == "/a/b"
    assert url_path("https://example.org") == "/"


def test_udf_matches_python(spark) -> None:
    from pyspark.sql import functions as F

    from don_crawler_spark.functions.urls import canonicalize_url_udf

    raws = [c for c, _ in CANON_CASES]
    df = spark.createDataFrame([(r,) for r in raws], ["u"]).select(
        "u", canonicalize_url_udf(F.col("u")).alias("c")
    )
    got = {r["u"]: r["c"] for r in df.collect()}
    for raw, want in CANON_CASES:
        assert got[raw] == want


def test_jvm_host_path_cols_match_python(spark) -> None:
    from pyspark.sql import functions as F

    from don_crawler_spark.functions.urls import host_col, path_col

    urls = [canonicalize_url(c) for c, _ in CANON_CASES]
    df = spark.createDataFrame([(u,) for u in urls], ["url"]).select(
        "url", host_col(F.col("url")).alias("h"), path_col(F.col("url")).alias("p")
    )
    for r in df.collect():
        assert r["h"] == url_host(r["url"]), r
        assert r["p"] == url_path(r["url"]), r


def test_split_full_name(spark) -> None:
    """Mirrors common/split_fullname_test.go:5-46."""
    from pyspark.sql import functions as F

    from don_crawler_spark.functions.urls import (
        repo_lock_key,
        split_full_name,
        title_from_repository_name,
    )

    cases = [
        ("owner/repo", "owner", "repo"),
        ("group/subgroup/repo", "group/subgroup", "repo"),
        ("repo", "", "repo"),
        ("", "", ""),
    ]
    df = spark.createDataFrame([(n,) for n, _, _ in cases], ["name"])
    vendor, repo = split_full_name(F.col("name"))
    out = {
        r["name"]: (r["v"], r["r"], r["t"], r["k"])
        for r in df.select(
            "name",
            vendor.alias("v"),
            repo.alias("r"),
            title_from_repository_name(F.col("name")).alias("t"),
            repo_lock_key(F.lit("example.org"), F.col("name")).alias("k"),
        ).collect()
    }
    for name, want_v, want_r in cases:
        v, r, t, _ = out[name]
        assert (v, r) == (want_v, want_r), name
        assert t == want_r  # path.Base == last segment for these inputs
    # repoLockKey semantics (crawler/crawler.go:620-632)
    assert out[""][3] == "example.org"
    assert out["repo"][3] == "example.org/repo"
    assert out["owner/repo"][3] == "example.org/owner/repo"
    assert out["group/subgroup/repo"][3] == "example.org/group/subgroup"


def test_hybrid_canonical_matches_python(spark) -> None:
    """add_canonical_url (JVM fast path ∪ Python fallback) must equal the
    pure-Python canonicalizer byte-for-byte for every shape — simple ones
    via the codegen'd branch, everything else via the UDF branch."""
    from pyspark.sql import functions as F

    from don_crawler_spark.functions.urls import add_canonical_url

    base = "https://Example.ORG/dir/page"
    hrefs = [
        # fast-path absolute shapes
        "https://a.example/x", "HTTPS://A.Example/X/", "http://h",
        "https://h/", "https://h/a//", "https://h///", "http://h/a%20b",
        "https://h/.well-known/x", "https://h/a.b-c_d~e",
        # fast-path root-relative shapes
        "/abs", "/", "/a/b/", "/trailing///", "/%2Fesc",
        # fallback shapes: query, fragment, port, userinfo, protocol-rel,
        # relative-no-slash, whitespace, unicode host, dot segments
        "https://h/p?b=2&a=1", "https://h/p#frag", "https://h:8080/p",
        "https://u:pw@h/p", "//other.org/y", "sub/x", "../up",
        "  https://h/sp  ", "https://ünïcode.example/p", "?q=1", "",
        "https://h/p?", "x",
        # dot segments: urljoin resolves these; the fast path must NOT
        # claim them (regression: ADVICE r01 — '/a/../b' fast-pathed)
        "/a/../b", "/..", "/./x", "/a/.", "/a/b/..", "/.hidden",
        "https://h/a/../b", "https://h/.", "https://h/x.y",
        # Unicode whitespace: Python str.strip() removes U+00A0 / U+2028,
        # Java \s (and now the printable-ASCII class) does not match them
        "/a/b ", "https://h/p ", " /lead", "/p ",
    ]
    from don_crawler_spark.functions.urls import canonicalize_url

    df = spark.createDataFrame(
        [(i, h, base) for i, h in enumerate(hrefs)], ["i", "href", "base"]
    )
    out = add_canonical_url(df, "href", "base", "c")
    got = {r["i"]: r["c"] for r in out.collect()}
    assert len(got) == len(hrefs), "rows lost or duplicated by the union split"
    for i, h in enumerate(hrefs):
        want = canonicalize_url(h, base)
        assert got[i] == want, (h, got[i], want)


def test_hybrid_canonical_null_rows_survive(spark) -> None:
    from pyspark.sql import types as T

    from don_crawler_spark.functions.urls import add_canonical_url

    schema = T.StructType([
        T.StructField("i", T.IntegerType()),
        T.StructField("href", T.StringType()),
        T.StructField("base", T.StringType()),
    ])
    df = spark.createDataFrame(
        [(0, None, "https://h/p"), (1, "/x", None), (2, None, None)], schema
    )
    out = add_canonical_url(df, "href", "base", "c").collect()
    assert len(out) == 3


def test_abs_hybrid_matches_python(spark) -> None:
    """add_canonical_url_abs (base-less fast path for seed/frontier URLs)
    must equal canonicalize_url byte-for-byte on every shape."""
    from pyspark.sql import functions as F

    from don_crawler_spark.functions.urls import (
        add_canonical_url_abs,
        canonicalize_url,
    )

    urls = [
        "https://a.example/x", "HTTPS://A.Example/X/", "http://h",
        "https://h/", "https://h///", "http://h/a%20b", "https://h/a.b-c_d~e",
        "https://h/p?b=2&a=1", "https://h/p#frag", "https://h:8080/p",
        "https://h:443/p", "https://u:pw@h/p", "https://h/a/../b",
        "  https://h/sp  ", "https://ünïcode.example/p", "",
        "https://h/p ", "ftp://files.example/x",
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], ["i", "u"]
    )
    got = {r["i"]: r["c"] for r in add_canonical_url_abs(df, "u", "c").collect()}
    assert len(got) == len(urls)
    for i, u in enumerate(urls):
        want = canonicalize_url(u)
        assert got[i] == want, (u, got[i], want)
