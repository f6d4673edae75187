"""JSON-LD extraction + entity dedup over interleaved span arrays.

The reference walks HTML with BeautifulSoup per page
(crawler.py:641-753) and dedups entities against a per-site key set
(crawler.py:630-639,106-129). Our documents are pre-parsed interleaved
spans (driver input_hint), so extraction is a `mapInPandas` over Arrow
batches that reads `kind='jsonld'|'meta'|'title'` spans and emits one
row per JSON-LD entity, plus a synthesized-candidate row per page
(reference synthesize_schema fallback, crawler.py:755-851).

Reference dedup semantics reproduced exactly (crawler.py:656-742):
- key = @id, else url, else None               (crawler.py:630-639)
- top-level list:  keyed item kept iff key unseen; keyless always kept
- @graph:          same rule per graph item
- single dict:     record ALWAYS kept (and counted); key registered iff
                   unseen — registration without suppression
- synthesized:     emitted iff the page produced no jsonld records;
                   never registers a key; NOT counted in type_counts
- "unseen" = not in the entity_seen table AND no earlier occurrence in
  canonical crawl order this round (the reference processes pages
  sequentially; our window over (seq, span_offset, item_idx) reproduces
  first-wins ordering exactly).
- @type may be a string or a list (crawler.py:137-147) -> normalized to
  array<string>; list-valued types count once per element.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENTITY = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("site", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("span_offset", T.IntegerType(), False),
        T.StructField("item_idx", T.IntegerType(), False),
        T.StructField("shape", T.StringType(), False),
        T.StructField("entity_key", T.StringType(), True),
        T.StructField("types", T.ArrayType(T.StringType()), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("payload_json", T.StringType(), True),
    ]
)


def extract_key(obj) -> str | None:
    """@id first, else url (crawler.py:630-639)."""
    if isinstance(obj, dict):
        if "@id" in obj:
            return obj["@id"]
        if "url" in obj:
            return obj["url"]
    return None


def norm_types(t) -> list[str] | None:
    if t is None:
        return None
    if isinstance(t, list):
        return [str(x) for x in t]
    return [str(t)]


def entity_rows_for_page(url: str, site: str, seq: int, round_no: int, spans) -> list[tuple]:
    """Pure-Python per-page extraction — shared with the oracle so engine
    and oracle cannot drift. spans: iterable of (kind, text, media_ref,
    offset), already offset-ordered."""
    rows: list[tuple] = []
    title = None
    metas: dict[str, str] = {}
    for kind, text, _media, off in spans:
        if kind == "title" and title is None:
            title = text
        elif kind == "meta":
            try:
                m = json.loads(text)
                metas.setdefault(m["p"], m["c"])
            except (json.JSONDecodeError, KeyError, TypeError):
                pass
        elif kind == "jsonld":
            try:
                data = json.loads(text)
            except json.JSONDecodeError:
                continue
            if isinstance(data, list):
                shape, items = "list-item", data
            elif isinstance(data, dict) and "@graph" in data:
                shape, items = "graph-item", data["@graph"]
            elif isinstance(data, dict):
                shape, items = "single", [data]
            else:
                continue
            for i, item in enumerate(items):
                if not isinstance(item, dict):
                    continue
                rows.append(
                    (
                        url,
                        site,
                        round_no,
                        seq,
                        off,
                        i,
                        shape,
                        extract_key(item),
                        norm_types(item.get("@type")),
                        item.get("name"),
                        json.dumps(item, sort_keys=True),
                    )
                )
    # synthesized candidate (kept later only if the page yielded no
    # jsonld records): reference synthesize_schema, crawler.py:755-851
    schema_type = "BlogPosting" if "article:published_time" in metas else "WebPage"
    desc = metas.get("description") or metas.get("og:description")
    payload = {
        "url": url,
        "@context": "https://schema.org",
        "@type": schema_type,
        "mainEntityOfPage": {"@type": "WebPage", "@id": url},
        "headline": title,
        "description": desc,
    }
    if metas.get("og:image"):
        img = {"@type": "ImageObject", "url": metas["og:image"]}
        if metas.get("og:image:width"):
            img["width"] = int(metas["og:image:width"])
        if metas.get("og:image:height"):
            img["height"] = int(metas["og:image:height"])
        payload["image"] = img
    rows.append(
        (
            url,
            site,
            round_no,
            seq,
            2**31 - 1,
            0,
            "synth",
            url,
            [schema_type],
            title,
            json.dumps(payload, sort_keys=True),
        )
    )
    return rows


def extract_entities(docs: DataFrame) -> DataFrame:
    """mapInPandas: fetched pages -> entity candidate rows.

    Input needs columns (url, site, round, seq, spans). JSON parsing is
    per-value by nature; it runs inside Arrow batches (no per-row Spark
    round trips).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in ENTITY.fields]
        for pdf in batches:
            out: list[tuple] = []
            for url, site, rnd, seq, spans in zip(
                pdf["url"], pdf["site"], pdf["round"], pdf["seq"], pdf["spans"]
            ):
                span_tuples = sorted(
                    ((s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans),
                    key=lambda t: t[3],
                )
                out.extend(entity_rows_for_page(url, site, int(seq), int(rnd), span_tuples))
            yield pd.DataFrame(out, columns=cols)

    return docs.select("url", "site", "round", "seq", "spans").mapInPandas(run, ENTITY)


def dedup_entities(
    entities: DataFrame, entity_seen: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Apply the reference's key-dedup rules -> (kept_records, new_keys).

    kept_records keeps the ENTITY columns; new_keys is (site, entity_key)
    to append to entity_seen.
    """
    jsonld = entities.filter(F.col("shape") != "synth")
    keyed = jsonld.filter(F.col("entity_key").isNotNull())
    w = Window.partitionBy("site", "entity_key").orderBy("seq", "span_offset", "item_idx")
    keyed = keyed.withColumn("occ", F.row_number().over(w))
    seen_keys = entity_seen.select("site", "entity_key")
    first_new = keyed.filter(F.col("occ") == 1).join(
        seen_keys, ["site", "entity_key"], "left_anti"
    )
    new_keys = first_new.select("site", "entity_key")

    kept_lg = first_new.filter(F.col("shape").isin("list-item", "graph-item")).drop("occ")
    keyless = jsonld.filter(F.col("entity_key").isNull())
    single = keyed.filter(F.col("shape") == "single").drop("occ")
    kept_jsonld = keyless.unionByName(single).unionByName(kept_lg)

    synth = entities.filter(F.col("shape") == "synth")
    kept_synth = synth.join(kept_jsonld.select("url").distinct(), "url", "left_anti")
    return kept_jsonld.unionByName(kept_synth), new_keys


def type_counts(records: DataFrame) -> DataFrame:
    """A1: per-site @type counts; list-valued @type counts per element
    (crawler.py:137-147); synthesized records not counted (the reference
    never calls update_json_type_count on the synthesize path)."""
    return (
        records.filter(F.col("shape") != "synth")
        .select("site", F.explode_outer("types").alias("type"))
        .filter(F.col("type").isNotNull())
        .groupBy("site", "type")
        .agg(F.count("*").alias("count"))
    )
