"""URL/domain curation operators (pipeline/curation.py, round 12):
host extraction, eTLD+1 reduction, blocklist filtering (literal and
DataFrame paths, allowlist override), and per-domain caps."""
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def urls(spark):
    return spark.createDataFrame([
        Row(doc_id=1, url="https://www.src3.com/p/1"),
        Row(doc_id=2, url="https://cdn.src1.org/p/2"),
        Row(doc_id=3, url="https://img.static.src7.co.uk/p/3"),
        Row(doc_id=4, url="https://src5.net/p/4"),
        Row(doc_id=5, url="https://keep.src3.com/p/5"),
        Row(doc_id=6, url="not a url at all"),
        Row(doc_id=7, url="https://user:pw@src9.com:8443/x?y#z"),
    ])


def test_url_host_and_registered_domain(spark, urls):
    from xcube_spark.pipeline.curation import registered_domain, url_host

    got = {r["doc_id"]: (r["h"], r["d"]) for r in urls.select(
        "doc_id",
        url_host(F.col("url")).alias("h"),
        registered_domain(url_host(F.col("url"))).alias("d"),
    ).collect()}
    assert got[1] == ("www.src3.com", "src3.com")
    assert got[2] == ("cdn.src1.org", "src1.org")
    # ccTLD second-level rule: co.uk keeps three labels
    assert got[3] == ("img.static.src7.co.uk", "src7.co.uk")
    assert got[4] == ("src5.net", "src5.net")
    assert got[6] == ("", "")  # unparseable -> empty, never a crash
    # userinfo and port are stripped
    assert got[7] == ("src9.com:8443".split(":")[0], "src9.com")


def test_domain_filter_literal_and_allowlist(spark, urls):
    from xcube_spark.pipeline.curation import domain_filter

    out = {r["doc_id"]: r["blocked"] for r in domain_filter(
        urls, blocklist=("src3.com", "net"),
        allowlist=("keep.src3.com",)).collect()}
    assert out[1] is True       # www.src3.com via suffix
    assert out[5] is False      # allowlist overrides the block
    assert out[4] is True       # bare TLD entry blocks src5.net
    assert out[2] is False
    assert out[6] is False


def test_domain_filter_dataframe_blocklist_matches_literal(spark, urls):
    from xcube_spark.pipeline.curation import domain_filter

    entries = ("src3.com", "net", "cdn.src1.org")
    lit = {r["doc_id"]: r["blocked"]
           for r in domain_filter(urls, blocklist=entries).collect()}
    bl_df = spark.createDataFrame([Row(entry=e) for e in entries])
    df = {r["doc_id"]: r["blocked"]
          for r in domain_filter(urls, blocklist=bl_df).collect()}
    assert lit == df
    assert lit[2] is True  # exact-host entry


def test_domain_filter_literal_path_has_no_exchange(spark, urls):
    from xcube_spark.pipeline.curation import domain_filter

    plan = domain_filter(
        urls, blocklist=("src3.com",))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_domain_caps_deterministic_and_capped(spark):
    from xcube_spark.pipeline.curation import domain_caps

    rows = [Row(doc_id=i, url=f"https://src{i % 2}.com/p/{i}")
            for i in range(20)]
    df = spark.createDataFrame(rows)
    out = domain_caps(df, cap=4).collect()
    kept = {}
    for r in out:
        kept.setdefault(r["domain"], []).append(r["kept"])
    for dom, flags in kept.items():
        assert sum(flags) == 4 and len(flags) == 10
    # idempotence: a grown corpus keeps the same picks for old ids
    grown = spark.createDataFrame(
        rows + [Row(doc_id=100 + i, url="https://src0.com/x")
                for i in range(5)])
    base = {(r["doc_id"]): r["kept"] for r in out}
    again = {r["doc_id"]: r["kept"]
             for r in domain_caps(grown, cap=4).collect()
             if r["doc_id"] < 100}
    # old src1 ids are untouched; old src0 ids can only LOSE slots to
    # new hash-earlier ids, never reshuffle among themselves
    src1_ids = [i for i in range(20) if i % 2 == 1]
    assert all(again[i] == base[i] for i in src1_ids)


def test_canonicalize_url_rules(spark):
    from xcube_spark.pipeline.curation import canonicalize_url

    cases = {
        1: ("HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
            "https://ex.com/a/b?a=1&b=2"),
        2: ("http://ex.com:80/", "http://ex.com/"),
        3: ("http://ex.com:8080/x", "http://ex.com:8080/x"),
        4: ("https://ex.com", "https://ex.com/"),
        5: ("https://ex.com/x?gclid=abc&fbclid=d&ref=z", "https://ex.com/x"),
        6: ("not a url", None),
        7: ("https://u:p@ex.com/x", "https://ex.com/x"),
        8: ("https://ex.com/x///", "https://ex.com/x"),
    }
    df = spark.createDataFrame(
        [(k, v[0]) for k, v in cases.items()], "id int, url string")
    got = {r["id"]: r["c"] for r in df.select(
        "id", canonicalize_url(F.col("url")).alias("c")).collect()}
    for k, (_, want) in cases.items():
        assert got[k] == want, (k, got[k], want)


def test_url_dedup_keeps_first_and_unparseable(spark):
    from xcube_spark.pipeline.curation import url_dedup

    df = spark.createDataFrame([
        (1, "https://ex.com/x?b=2&a=1"),
        (2, "https://WWW.ex.com/x/?a=1&b=2&utm_source=s"),
        (3, "https://ex.com/x?a=1"),   # different params -> distinct
        (4, "garbage"),
        (5, "garbage"),                # unparseables never dedup
    ], "doc_id long, url string")
    got = {r["doc_id"]: r["kept"] for r in url_dedup(df).collect()}
    assert got == {1: True, 2: False, 3: True, 4: True, 5: True}


def test_incremental_domain_caps_sequential_chaining(spark):
    """Chaining two batches through state addition equals applying
    them sequentially — and a full domain never admits new docs."""
    from xcube_spark.pipeline.curation import (domain_caps_state,
                                               incremental_domain_caps)

    mk = lambda ids: spark.createDataFrame(
        [(i, f"https://src{i % 2}.com/p/{i}") for i in ids],
        "doc_id long, url string")
    cap = 3
    b1, b2 = mk(range(10)), mk(range(100, 120))
    s1 = domain_caps_state(b1, cap)
    out2 = incremental_domain_caps(s1, b2, cap).collect()
    # batch 1 fills both domains (5 docs each > cap=3): nothing admitted
    assert all(not r["kept"] for r in out2)
    # with a roomier cap the new batch takes exactly the leftovers
    cap = 7
    s1 = domain_caps_state(b1, cap)
    out2 = incremental_domain_caps(s1, b2, cap).collect()
    per_dom = {}
    for r in out2:
        per_dom.setdefault(r["domain"], []).append(r["kept"])
    for dom, flags in per_dom.items():
        assert sum(flags) == 2  # 7 - 5 already kept
