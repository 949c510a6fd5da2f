"""Link-graph family behavior pins (round 10, second half). Value
equality runs in the oracle suite; this file pins the parsing
semantics, the plan shape, and the domain-id determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_data_etl_gcs_spark.queries.linkgraph import links_frame


def _links(spark, html: str):
    docs = spark.createDataFrame(
        [(1, "ignored", "en", "srcX", 7)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    # bypass the fixture: parse a handcrafted page directly
    from event_data_etl_gcs_spark.operators.html import (
        anchor_texts_sql,
        href_host_sql,
        hrefs_sql,
    )

    df = (
        spark.createDataFrame([(1, html)], "doc_id long, html string")
        .select(
            "doc_id",
            F.expr(hrefs_sql("html")).alias("hrefs"),
            F.expr(anchor_texts_sql("html")).alias("atexts"),
        )
        .select("doc_id", F.posexplode("hrefs").alias("pos0", "href"), "atexts")
        .select(
            (F.col("pos0") + 1).alias("link_pos"),
            "href",
            F.element_at("atexts", F.col("pos0") + 1).alias("anchor_text"),
            F.expr(href_host_sql("href")).alias("host"),
        )
    )
    return df.orderBy("link_pos").collect()


def test_href_and_anchor_text_stay_aligned(spark):
    html = (
        '<p>See <a href="https://a.example.com/x">the <b>first</b> ref</a> '
        'and <a href="/local/page">a  local\n page</a> then '
        '<a class="btn" href="https://b.example.com/y/z">second   ref</a>.</p>'
    )
    rows = _links(spark, html)
    assert [(r["href"], r["anchor_text"], r["host"]) for r in rows] == [
        ("https://a.example.com/x", "the first ref", "a.example.com"),
        ("/local/page", "a local page", ""),
        ("https://b.example.com/y/z", "second ref", "b.example.com"),
    ]


def test_anchor_without_href_ignored(spark):
    rows = _links(spark, '<a name="top">no href</a> <a href="/ok">ok</a>')
    assert [(r["href"], r["anchor_text"]) for r in rows] == [("/ok", "ok")]


def test_quote_styles_hand_counted_page(spark):
    """VERDICT r10 directive #2: a hand-written page mixing all three
    href quote styles (double, single, unquoted — the latter two common
    in real crawls and silently dropped pre-r11) plus spacing around
    '=', a data-href decoy, a protocol-relative URL, and entity-laden
    anchor text. Exactly 7 links, in document order, every href and
    host recovered."""
    html = (
        '<body><nav><a href="https://dq.example.com/a">double</a>'
        " <a href='https://sq.example.com/b'>single</a>"
        " <a href=https://uq.example.com/c>unquoted</a></nav>"
        '<p><a data-href="/decoy" name="x">decoy only</a>'
        " <a href = '/rel-sq'>rel single</a>"
        " <a href= /rel-uq>rel unquoted</a>"
        ' <a href="//pr.example.com/lib">proto relative</a>'
        ' <a href="/entity">Q&amp;A &#77;ix &lt;t&gt;</a></p></body>'
    )
    rows = _links(spark, html)
    assert [(r["href"], r["anchor_text"], r["host"]) for r in rows] == [
        ("https://dq.example.com/a", "double", "dq.example.com"),
        ("https://sq.example.com/b", "single", "sq.example.com"),
        ("https://uq.example.com/c", "unquoted", "uq.example.com"),
        ("/rel-sq", "rel single", ""),
        ("/rel-uq", "rel unquoted", ""),
        ("//pr.example.com/lib", "proto relative", "pr.example.com"),
        ("/entity", 'Q&A Mix <t>', ""),
    ]


def test_fixture_quote_variants_all_harvested(spark):
    """The fixture's single-quoted nav link, unquoted nav link, and the
    even-doc unquoted EXTERNAL footer link must all be harvested — the
    edge list cannot depend on the crawl's quoting habits."""
    from event_data_etl_gcs_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    links = links_frame(docs)
    n_docs = docs.count()
    # every page: nav /archive (single-quoted) + /about (unquoted)
    assert links.filter(F.col("href") == "/archive").count() == n_docs
    assert links.filter(F.col("href") == "/about").count() == n_docs
    # every external carries a host (unquoted + protocol-relative incl.)
    ext = links.filter(F.col("is_external"))
    assert ext.filter(F.col("host") == "").count() == 0
    # the footer related-source external (absolute https://d<N>...)
    # appears once per page, the even-doc half via the UNQUOTED spelling
    footer = ext.filter(F.col("href").startswith("https://d"))
    assert footer.count() == n_docs
    assert footer.filter(F.col("doc_id") % 2 == 0).count() == (n_docs + 1) // 2
    # protocol-relative CDN link: one per %3==2 page, host resolved
    from pyspark.sql import Row

    cdn = ext.filter(F.col("href") == "//cdn.example.net/mirror")
    n_aside = docs.filter(F.col("doc_id") % 3 == 2).count()
    assert cdn.count() == n_aside and n_aside > 0
    assert cdn.select("host").distinct().collect() == [
        Row(host="cdn.example.net")
    ]


def test_canonical_url_semantics_on_fixture(spark):
    """Round 11: canonicalization strips tracking params + fragments,
    keeps real params, resolves relative hrefs against the page host,
    and nulls non-http schemes — pinned on the fixture's own links."""
    from event_data_etl_gcs_spark.queries.linkgraph import (
        canonical_links_frame,
    )
    from event_data_etl_gcs_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        F.col("doc_id").isin([1, 2])
    )
    rows = {
        (r["doc_id"], r["href"]): r["canonical_url"]
        for r in canonical_links_frame(docs).collect()
    }
    # the related-source footer links (the r12 alias links are pinned
    # separately in test_frontier_alias_spellings_collapse)
    ext = {
        k: v for k, v in rows.items() if "/ref/" in k[1]
    }
    assert len(ext) == 2
    for (doc_id, href), canon in ext.items():
        assert "#" not in canon and "utm_" not in canon and "gclid" not in canon
        if doc_id % 2 == 0:  # unquoted variant carried ?gclid=x&id=N
            assert canon.endswith(f"/ref/{doc_id}?id={doc_id}"), canon
        else:  # double-quoted variant carried ?utm_source=..&ref=a#sec
            assert canon.endswith(f"/ref/{doc_id}?ref=a"), canon
    # relative nav links resolve against the page host
    rel = {k: v for k, v in rows.items() if k[1] == "/about"}
    for (_, _), canon in rel.items():
        assert canon.startswith("https://src") and canon.endswith(
            ".example.com/about"
        )


def test_crawl_frontier_dedups_aliases(spark):
    """All docs of one source reference /about via different raw pages;
    the frontier holds ONE canonical row for it, with n_docs equal to
    the source's doc count."""
    from event_data_etl_gcs_spark.queries.linkgraph import crawl_frontier
    from event_data_etl_gcs_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    one_source = docs.groupBy("source").count().orderBy("source").first()
    url = f"https://{one_source['source']}.example.com/about"
    row = crawl_frontier(spark, sf).filter(
        F.col("canonical_url") == url
    ).collect()
    assert len(row) == 1
    assert row[0]["n_docs"] == one_source["count"]
    assert row[0]["dst_host"] == f"{one_source['source']}.example.com"


def test_frontier_alias_spellings_collapse(spark):
    """Round 12 (VERDICT r11 #3): the fixture's four footer alias
    spellings — default :443/:80 ports, uppercase scheme, duplicate
    path slashes, lowercase percent-hex, trailing empty query —
    collapse to exactly TWO canonical frontier rows, each referenced
    twice per page by every document."""
    from event_data_etl_gcs_spark.queries.linkgraph import crawl_frontier
    from event_data_etl_gcs_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    n_docs = load_table(spark, sf, "documents").count()
    rows = {
        r["canonical_url"]: r
        for r in crawl_frontier(spark, sf)
        .filter(F.col("dst_host") == "alias.example.net")
        .collect()
    }
    assert set(rows) == {
        "https://alias.example.net/x/%2Fy?id=7",
        "http://alias.example.net/plain",
    }
    for r in rows.values():
        assert r["n_refs"] == 2 * n_docs and r["n_docs"] == n_docs


def test_uppercase_scheme_href_classified_external(spark):
    """ADVICE r11: an 'HTTPS://...' href must get is_external=true and
    a host, consistent with canonicalization accepting the scheme
    case-insensitively — one (?i) on _HOST_RE keeps frontier and edge
    list in agreement."""
    rows = _links(spark, '<a href="HTTPS://Mixed.Example.ORG/x">up</a>')
    assert [(r["href"], r["host"]) for r in rows] == [
        ("HTTPS://Mixed.Example.ORG/x", "Mixed.Example.ORG")
    ]


def test_anchor_profile_pools_alias_text_and_budget_bounds_hosts(spark):
    """Round 12: the alias spellings pool their anchor-text evidence on
    the canonical form (4 texts across 2 canonical URLs), and the
    frontier budget emits at most HOST_BUDGET URLs per host."""
    from event_data_etl_gcs_spark.queries.linkgraph import (
        HOST_BUDGET,
        anchor_text_profile,
        frontier_host_budget,
    )
    from event_data_etl_gcs_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    n_docs = load_table(spark, sf, "documents").count()
    prof = {
        r["canonical_url"]: r
        for r in anchor_text_profile(spark, sf)
        .filter(F.col("canonical_url").contains("alias.example.net"))
        .collect()
    }
    a = prof["https://alias.example.net/x/%2Fy?id=7"]
    # 'alias one' + 'alias two' pooled: 2 texts, lexicographic min wins
    # the cnt tie
    assert a["n_refs"] == 2 * n_docs and a["n_texts"] == 2
    assert a["top_text"] == "alias one" and a["top_text_refs"] == n_docs
    b = prof["http://alias.example.net/plain"]
    assert b["n_texts"] == 2 and b["top_text"] == "alias four"
    per_host = (
        frontier_host_budget(spark, sf)
        .groupBy("dst_host")
        .agg(F.count("*").alias("n"), F.max("crawl_rank").alias("maxr"))
    )
    assert per_host.filter(F.col("n") > HOST_BUDGET).count() == 0
    assert per_host.filter(F.col("maxr") > HOST_BUDGET).count() == 0
    # the alias host offers exactly its two canonical URLs
    assert (
        frontier_host_budget(spark, sf)
        .filter(F.col("dst_host") == "alias.example.net")
        .count()
        == 2
    )


def test_extract_links_plan_is_map_only(spark):
    from event_data_etl_gcs_spark.queries.linkgraph import extract_links

    df = extract_links(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Generate explode" in plan or "Generate posexplode" in plan, plan


def test_canonical_links_plan_is_map_only(spark):
    from event_data_etl_gcs_spark.queries.linkgraph import canonical_links

    df = canonical_links(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_doc_outlink_authority_broadcasts_authority(spark):
    """The domain-sized authority table must broadcast into the per-doc
    link join — the doc-link stream is never hash-repartitioned on host
    to meet a domain-cardinality table."""
    from event_data_etl_gcs_spark.queries.linkgraph import (
        doc_outlink_authority,
    )

    df = doc_outlink_authority(spark, "/root/testdata/sf0.001")
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin [host" in plan, plan


def test_domain_ids_deterministic_across_partitionings(spark):
    from event_data_etl_gcs_spark.queries.linkgraph import domain_authority

    sf = "/root/testdata/sf0.001"
    a = sorted(tuple(r) for r in domain_authority(spark, sf).collect())
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        b = sorted(tuple(r) for r in domain_authority(spark, sf).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b and len(a) > 10
    # authority mass is conserved up to floor losses: sum <= 1.0 scale
    total = sum(r[1] for r in a)
    assert 0.99 * 10**12 < total <= 10**12


def test_fixture_links_cover_internal_and_external(spark):
    from event_data_etl_gcs_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    links = links_frame(docs)
    per_doc = links.groupBy("doc_id").agg(
        F.sum(F.col("is_external").cast("int")).alias("n_ext"),
        F.count("*").alias("n_all"),
    )
    # every page: one related-source footer link + the four r12 alias
    # links (all external — the HTTPS:// one counts since the (?i)
    # _HOST_RE fix); %3==2 pages add the protocol-relative CDN link
    assert per_doc.filter(
        (F.col("doc_id") % 3 == 2) & (F.col("n_ext") != 6)
    ).count() == 0
    assert per_doc.filter(
        (F.col("doc_id") % 3 != 2) & (F.col("n_ext") != 5)
    ).count() == 0
    assert per_doc.filter("n_all < 10").count() == 0
