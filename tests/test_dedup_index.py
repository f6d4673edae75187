"""Incremental near-dup signature index (engine dedup_index=True).

The invariant that makes the index O(|delta|)/round instead of an
O(corpus) recompute: each doc is fetched exactly once (J1 seen
anti-join), so appending document_signatures over each round's NEW docs
yields, after any number of rounds, EXACTLY the frame a batch recompute
over the whole documents table produces. These tests pin that equality
plus the lifecycle cascades (delete_site, refresh_sitemaps) and the
join-only near_dup_pairs query path.
"""

from pyspark.sql import functions as F

from crawler_spark.engine import CrawlEngine
from crawler_spark.operators.discovery import discover_frontier
from crawler_spark.operators.textdedup import (
    document_signatures,
    minhash_lsh_pairs,
)
from crawler_spark.world import make_world


def _rows(df, key="doc_id"):
    return sorted((r.asDict(recursive=True) for r in df.collect()), key=lambda r: r[key])


def _run_engine(spark, root, world, rounds=6, **kw):
    tables = world.to_spark(spark)
    eng = CrawlEngine(spark, root, dedup_index=True, embed_dim=0, **kw)
    eng.seed(
        discover_frontier(tables["seeds"], tables["robots"], tables["sitemaps"])
    )
    eng.run(tables, max_rounds=rounds)
    return eng, tables


def test_incremental_equals_batch_recompute(spark, tmp_path):
    world = make_world(seed=91, n_hosts=4, n_urls=28, budget=3, burst=False)
    eng, _ = _run_engine(spark, str(tmp_path / "a"), world)
    inc = eng.io.read(spark, "doc_signatures")
    docs = eng.io.read(spark, "documents")
    batch = document_signatures(docs)
    assert docs.count() > 0
    assert _rows(inc) == _rows(batch)
    # every doc has an index row (NULLs mark the unsignable tail)
    assert inc.count() == docs.count()


def test_near_dup_pairs_match_batch_operator(spark, tmp_path):
    world = make_world(seed=92, n_hosts=3, n_urls=20, budget=3, burst=False)
    eng, _ = _run_engine(spark, str(tmp_path / "b"), world)
    docs = eng.io.read(spark, "documents")
    from crawler_spark.operators.textdedup import doc_text

    text_docs = docs.select("doc_id", doc_text().alias("text"))
    want = {
        (r.doc_a, r.doc_b) for r in minhash_lsh_pairs(text_docs).collect()
    }
    got = {(r.doc_a, r.doc_b) for r in eng.near_dup_pairs("minhash").collect()}
    assert got == want
    # simhash path runs and stays within the same id universe
    ids = {r.doc_id for r in docs.select("doc_id").collect()}
    for r in eng.near_dup_pairs("simhash").take(50):
        assert r.doc_a in ids and r.doc_b in ids
    # the dedup closure runs on the engine's md5-hex ids end-to-end:
    # pairs -> clusters -> canonical corpus (this used to ANSI-crash on
    # the long cast inside connected_components)
    from crawler_spark.operators.graph import canonical_corpus, connected_components

    losers = {
        r.doc_id
        for r in connected_components(eng.near_dup_pairs("minhash")).collect()
        if r.doc_id != r.cluster_id
    }
    canon = {
        r.doc_id
        for r in canonical_corpus(
            docs.select("doc_id"), eng.near_dup_pairs("minhash")
        ).collect()
    }
    assert canon == ids - losers


def test_delete_site_cascades_signatures(spark, tmp_path):
    world = make_world(seed=93, n_hosts=3, n_urls=18, budget=3, burst=False)
    eng, tables = _run_engine(spark, str(tmp_path / "c"), world, rounds=4)
    sites = [r.site for r in eng.io.read(spark, "doc_signatures").select("site").distinct().collect()]
    assert len(sites) >= 2
    victim = sorted(sites)[0]
    eng.delete_site(victim)
    left = eng.io.read(spark, "doc_signatures")
    assert left.filter(F.col("site") == victim).count() == 0
    # surviving sites keep exact batch parity
    docs = eng.io.read(spark, "documents")
    assert _rows(left) == _rows(document_signatures(docs))


def test_refresh_prunes_removed_docs_signatures(spark, tmp_path):
    from crawler_spark import schemas as S

    world = make_world(seed=94, n_hosts=3, n_urls=18, budget=3, burst=False)
    eng, tables = _run_engine(spark, str(tmp_path / "d"), world, rounds=8)
    # shrink the trees: drop one already-crawled sitemap-owned URL
    victim = (
        eng.io.read(spark, "seen")
        .join(eng.io.read(spark, "frontier").filter(F.col("depth") == 0), "url_hash")
        .first()
    )
    sm = world.sitemaps.copy()
    sm["entries"] = sm["entries"].map(lambda es: [e for e in es if e != victim.url])
    seeds2 = world.seeds[world.seeds.url != victim.url]
    tables2 = dict(tables)
    tables2["sitemaps"] = spark.createDataFrame(list(sm.itertuples(index=False)), S.SITEMAPS)
    tables2["seeds"] = spark.createDataFrame(list(seeds2.itertuples(index=False)), S.SEEDS)
    eng.refresh_sitemaps(tables2)
    sigs = eng.io.read(spark, "doc_signatures")
    docs = eng.io.read(spark, "documents")
    assert sigs.filter(F.col("doc_id") == victim.url_hash).count() == 0
    # index tracks the pruned documents table exactly
    assert _rows(sigs) == _rows(document_signatures(docs))


# --- media pHash index (media_signatures table) --------------------------


def test_media_index_incremental_equals_batch_and_covers_spans(spark, tmp_path):
    from crawler_spark.operators.multimodal import media_signatures

    world = make_world(seed=93, n_hosts=4, n_urls=28, budget=3, burst=False)
    eng, _ = _run_engine(spark, str(tmp_path / "m"), world)
    inc = eng.io.read(spark, "media_signatures")
    docs = eng.io.read(spark, "documents")
    batch = media_signatures(docs)
    n_spans = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .count()
    )
    assert n_spans > 0
    assert inc.count() == n_spans  # one index row per media occurrence
    # composite key: media_ref repeats across docs (one row/occurrence),
    # so a single-column sort would leave tied rows in collect() order
    key = lambda r: (r["media_ref"], r["doc_id"])  # noqa: E731
    assert sorted((r.asDict() for r in inc.collect()), key=key) == sorted(
        (r.asDict() for r in batch.collect()), key=key
    )


def test_media_near_dup_pairs_match_batch_operator(spark, tmp_path):
    from crawler_spark.operators.multimodal import (
        media_from_documents,
        media_near_dup_pairs,
    )

    world = make_world(seed=94, n_hosts=3, n_urls=20, budget=3, burst=False)
    eng, _ = _run_engine(spark, str(tmp_path / "n"), world)
    docs = eng.io.read(spark, "documents")
    media = media_from_documents(docs).dropDuplicates(["media_ref"])
    want = {
        (r.ref_a, r.ref_b)
        for r in media_near_dup_pairs(media, max_hamming=6).collect()
    }
    got = {
        (r.ref_a, r.ref_b)
        for r in eng.near_dup_pairs("phash", max_hamming=6).collect()
    }
    assert got == want


def test_media_index_cascades_on_delete(spark, tmp_path):
    world = make_world(seed=95, n_hosts=3, n_urls=18, budget=3, burst=False)
    eng, _ = _run_engine(spark, str(tmp_path / "d"), world)
    sites = [
        r.site
        for r in eng.io.read(spark, "media_signatures").select("site").distinct().collect()
    ]
    assert len(sites) > 1
    victim = sorted(sites)[0]
    eng.delete_site(victim)
    left = eng.io.read(spark, "media_signatures")
    assert left.filter(F.col("site") == victim).count() == 0
    assert left.count() > 0  # other sites untouched


def test_media_clusters_group_identical_payloads(spark, tmp_path):
    world = make_world(seed=96, n_hosts=3, n_urls=18, budget=3, burst=False)
    eng, _ = _run_engine(spark, str(tmp_path / "c"), world)
    pairs = eng.near_dup_pairs("phash", max_hamming=3)
    clusters = eng.media_clusters(max_hamming=3)
    refs_in_pairs = {
        r for p in pairs.collect() for r in (p.ref_a, p.ref_b)
    }
    got = {r.media_ref: r.cluster_id for r in clusters.collect()}
    assert set(got) == refs_in_pairs  # every paired ref is clustered
    # cluster_id is the member minimum and every pair is co-clustered
    for p in pairs.collect():
        assert got[p.ref_a] == got[p.ref_b]
    for ref, cid in got.items():
        assert cid <= ref


def test_mine_captions_dedup_media(spark, tmp_path):
    world = make_world(seed=96, n_hosts=3, n_urls=18, budget=3, burst=False)
    eng, _ = _run_engine(spark, str(tmp_path / "cap"), world)
    all_pairs = {r["media_ref"] for r in eng.mine_captions().collect()}
    kept = {r["media_ref"] for r in eng.mine_captions(dedup_media=True).collect()}
    clusters = {
        r["media_ref"]: r["cluster_id"]
        for r in eng.media_clusters(max_hamming=3).collect()
    }
    # exactly the non-canonical cluster members disappear
    losers = {ref for ref, cid in clusters.items() if ref != min(
        m for m, c in clusters.items() if c == cid)}
    assert kept == all_pairs - losers
    # every surviving clustered ref is its cluster's minimum
    for ref in kept & set(clusters):
        cid = clusters[ref]
        assert ref == min(m for m, c in clusters.items() if c == cid)
