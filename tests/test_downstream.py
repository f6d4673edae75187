"""M7 downstream pipeline: text prep, stub embeddings, upload dedup."""

import json

from pyspark.sql import functions as F

from crawler_spark import schemas as S
from crawler_spark.operators.downstream import (
    embed_new_records,
    hash_embedding,
    prepare_embed_text,
    select_for_upload,
    transform_for_upload,
)


def records_df(spark):
    rows = [
        # (url, site, round, seq, shape, entity_key, types, name, payload_json)
        ("u1", "s1", 1, 1, "single", "k1", ["Recipe"], "Cake",
         json.dumps({"description": "sweet", "recipeIngredient": [f"i{n}" for n in range(12)]})),
        ("u2", "s1", 1, 2, "synth", "u2", ["WebPage"], None,
         json.dumps({"headline": "H2", "articleBody": "x" * 600})),
        ("u3", "s2", 1, 3, "single", None, None, "NoType", json.dumps({})),
    ]
    return spark.createDataFrame(rows, S.RECORDS)


def test_prepare_embed_text(spark):
    out = {r.url: r.embed_text for r in prepare_embed_text(records_df(spark)).collect()}
    # reference layout (crawler.py:1027-1070): labeled lines, first 10
    # ingredients, 500-char body cap
    assert out["u1"].startswith("Type: Recipe\nName: Cake\nDescription: sweet\nIngredients: ")
    assert out["u1"].count("i1") >= 1 and "i10" not in out["u1"].split("Ingredients: ")[1]
    assert out["u2"] == "Type: WebPage\nName: H2\nContent: " + "x" * 500
    assert out["u3"] == "Name: NoType"


def test_hash_embedding_deterministic(spark):
    df = spark.createDataFrame([("hello",), ("hello",), ("world",)], ["t"]).select(
        hash_embedding(F.col("t"), 4).alias("e")
    )
    rows = [tuple(r.e) for r in df.collect()]
    assert rows[0] == rows[1] != rows[2]
    assert all(-0.5 <= v <= 0.5 for v in rows[0])
    assert len(rows[0]) == 4


def test_embed_and_upload_dedup(spark):
    recs = records_df(spark)
    empty_emb = spark.createDataFrame([], S.EMBEDDINGS)
    emb1 = embed_new_records(recs, empty_emb, 1, dim=4)
    assert emb1.count() == 3
    # J3: same records again -> nothing new
    assert embed_new_records(recs, emb1, 2, dim=4).count() == 0
    # J4: first upload takes all, second takes none
    empty_upl = spark.createDataFrame([], S.UPLOADED)
    upl1 = select_for_upload(emb1, empty_upl, 1)
    assert upl1.count() == 3
    assert select_for_upload(emb1, upl1, 2).count() == 0


def test_metadata_auto_flatten_primitives(spark):
    """F13 (crawler.py:1243-1247): top-level primitives of the schema
    dict land in metadata; nested objects/arrays don't; schema keys
    override the base type/url entries (dict-assignment order)."""
    payload = json.dumps(
        {
            "headline": "H",
            "count": 7,
            "score": 1.5,
            "free": True,
            "author": {"name": "A"},        # nested object: skipped
            "tags": ["x", "y"],             # array: skipped
            "url": "https://canonical/x",   # primitive override of base url
            "nothing": None,                # null: skipped
            "brace": "{looks nested}",      # GENUINE string: kept (typed
            "brack": "[0..9]",              # flatten, not text-shape)
        }
    )
    rows = [("u9", "s1", 1, 1, "single", "k9", ["Article"], "N", payload)]
    recs = spark.createDataFrame(rows, S.RECORDS)
    emb = embed_new_records(recs, spark.createDataFrame([], S.EMBEDDINGS), 1, dim=4)
    md = emb.first().metadata
    assert md["headline"] == "H"
    assert md["count"] == "7"
    assert md["score"] == "1.5"
    assert md["free"] == "true"
    assert "author" not in md and "tags" not in md and "nothing" not in md
    assert md["brace"] == "{looks nested}" and md["brack"] == "[0..9]"
    assert md["url"] == "https://canonical/x"  # schema primitive wins
    assert md["type"] == "Article"  # base entry preserved (no collision)


def test_transform_for_upload(spark):
    recs = records_df(spark)
    emb = embed_new_records(recs, spark.createDataFrame([], S.EMBEDDINGS), 1, dim=4)
    out = {r.url: r for r in transform_for_upload(emb).collect()}
    r = out["k1"]
    assert r.metadata["site"] == "s1"  # P9: site injected (crawler.py:1155-1158)
    assert r.metadata["type"] == "Recipe"
    assert len(r.vector) == 4
    assert json.loads(r.schema_json)["description"] == "sweet"


def test_engine_emits_embeddings(spark, tmp_path):
    from crawler_spark.engine import CrawlEngine
    from crawler_spark.operators.discovery import discover_frontier
    from crawler_spark.world import make_world

    world = make_world(seed=31, n_hosts=2, n_urls=10, budget=3, burst=False)
    t = world.to_spark(spark)
    eng = CrawlEngine(spark, str(tmp_path), embed_dim=8)
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng.run(t, max_rounds=8)
    emb = eng.io.read(spark, "embeddings")
    upl = eng.io.read(spark, "uploaded")
    n_emb = emb.count()
    assert n_emb > 0
    assert upl.count() == n_emb  # everything embedded got uploaded exactly once
    assert emb.select("site", "key").distinct().count() == n_emb  # J3 key-dedup held
    assert len(emb.first().embedding) == 8


def test_upload_via_transport_batching_and_failure(spark):
    """K8 wire sink: deterministic per-site batching (never mixes
    sites, chunks of batch_size in (site,url) order), whole-batch 599
    on transport exception with other sites unaffected."""
    from crawler_spark.operators.downstream import upload_via_transport

    rows = [(f"u{i}", "s1" if i < 5 else "s2") for i in range(8)]
    docs = spark.createDataFrame(rows, ["url", "site"]).select(
        "url",
        F.array(F.lit(0.1)).cast("array<float>").alias("vector"),
        "site",
        F.create_map(F.lit("k"), F.lit("v")).alias("metadata"),
        F.lit("{}").alias("schema_json"),
    )

    def fake(points):
        assert len({p["site"] for p in points}) == 1  # fails batch -> 599 if mixed
        if points[0]["site"] == "s2":
            raise RuntimeError("endpoint down")
        return [200] * len(points)

    res = upload_via_transport(docs, fake, batch_size=2).collect()
    got = {r.url: (r.status, r.batch_idx) for r in res}
    assert len(got) == 8
    # s1: 5 docs in url order -> batches [u0,u1],[u2,u3],[u4]
    assert [got[f"u{i}"][1] for i in range(5)] == [0, 0, 1, 1, 2]
    assert all(got[f"u{i}"][0] == 200 for i in range(5))
    # s2's transport raises -> its batches fail wholesale, s1 unaffected
    assert all(got[f"u{i}"][0] == 599 for i in range(5, 8))


def test_upload_post_ack_hook(spark, tmp_path):
    """Post-upload side-effect hook (reference: per-doc permission
    grants after upsert, crawler.py:1173-1186): runs once per 2xx batch
    with exactly the acked points; a RAISING hook withdraws the ack
    (599) so upload+grant retry together next round."""
    import json
    import os

    from crawler_spark.operators.downstream import upload_via_transport

    rows = [(f"u{i}", "s1" if i < 4 else "s2") for i in range(6)]
    docs = spark.createDataFrame(rows, ["url", "site"]).select(
        "url",
        F.array(F.lit(0.1)).cast("array<float>").alias("vector"),
        "site",
        F.create_map(F.lit("k"), F.lit("v")).alias("metadata"),
        F.lit("{}").alias("schema_json"),
    )
    grant_dir = str(tmp_path / "grants")
    os.makedirs(grant_dir, exist_ok=True)

    def transport(points):
        # s2's second point is rejected by the DB (not acked)
        return [503 if p["url"] == "u5" else 200 for p in points]

    def grant(points):
        # the hook runs in the executor's Python worker: record grants
        # via the filesystem (a real deployment calls the auth service)
        if points[0]["site"] == "s2":
            raise RuntimeError("auth service down")
        name = f"{points[0]['site']}-{points[0]['url']}.json"
        with open(os.path.join(grant_dir, name), "w") as f:
            json.dump(sorted(p["url"] for p in points), f)

    res = upload_via_transport(docs, transport, batch_size=2, post_ack=grant).collect()
    got = {r.url: r.status for r in res}
    # s1: uploaded AND granted -> stays 200
    assert all(got[f"u{i}"] == 200 for i in range(4))
    granted = sorted(
        u for fn in os.listdir(grant_dir) for u in json.load(open(os.path.join(grant_dir, fn)))
    )
    assert granted == ["u0", "u1", "u2", "u3"]  # exactly the acked s1 points
    # s2: grant raised -> acks withdrawn (599) so the caller retries;
    # the DB-rejected point keeps its real status
    assert got["u4"] == 599 and got["u5"] == 503


def test_engine_upload_transport_acks_gate_uploaded(spark, tmp_path):
    """Engine + wire sink: only 2xx-acked points are marked uploaded;
    a rejecting site's points stay pending (reference retry-on-next-
    poll: they re-enter J4 every round, never exactly-once-marked)."""
    from crawler_spark.engine import CrawlEngine
    from crawler_spark.operators.discovery import discover_frontier
    from crawler_spark.world import make_world

    world = make_world(seed=31, n_hosts=2, n_urls=10, budget=3, burst=False)
    t = world.to_spark(spark)

    def transport(points):
        # one site's vector-DB shard is down: never acks
        return [503 if p["site"] == "h001_example_com" else 200 for p in points]

    eng = CrawlEngine(
        spark, str(tmp_path), embed_dim=8,
        upload_transport=transport, upload_batch_size=4,
    )
    eng.seed(discover_frontier(t["seeds"], t["robots"], t["sitemaps"]))
    eng.run(t, max_rounds=8)
    emb = eng.io.read(spark, "embeddings")
    upl = eng.io.read(spark, "uploaded")
    emb_sites = {r.site for r in emb.select("site").distinct().collect()}
    assert "h001_example_com" in emb_sites and len(emb_sites) == 2
    assert {r.site for r in upl.select("site").distinct().collect()} == {
        "h000_example_com"
    }
    n_ok = emb.filter(F.col("site") == "h000_example_com").count()
    assert upl.count() == n_ok  # acked exactly once, rejected never
