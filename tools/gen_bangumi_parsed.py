#!/usr/bin/env python3
"""Independent re-derivation of the Bangumi parse boundary → parquet.

Reads the bundled fixture corpus (src/main/resources/bangumi/items.jsonl)
and re-implements, in pure Python, the reference pipeline's *parse* stage —
typed field extraction (reference bangumi_data_ingestion.py:309-323) plus
the polymorphic infobox flatten (reference :263-295) — writing one typed
parquet row per collection item to tools/fixtures/bangumi_parsed.parquet.

That parquet is the DuckDB-side input for the qb34–qb38 oracles: everything
downstream of the parse (the 21-col raw projection, the 27-col analytics
projection, the category summary, the quality metrics) is replayed in plain
SQL by the driver's DuckDB gate, so those lanes get a real independent-
engine check instead of rows-only + golden pins. Only the parse itself
stays re-derived here (DuckDB cannot run Spark's from_json or the custom
InfoboxToMap expression).

Parse contract notes (pinned by GoldenSpec on the Scala side):
  * tags uses Spark from_json PERMISSIVE semantics for
    array<struct<name,count>>: an element that is not a JSON object
    nullifies the WHOLE array field (the reference's Python instead skips
    non-dict entries; the engine's adjudicated contract is the Spark one,
    and the golden pins record it).
  * infobox follows the reference flatten exactly: blank keys dropped,
    list values "v"-extracted and ", "-joined, dict values "v"-extracted,
    scalars str()'d and stripped, falsy values dropped. Entry order is
    preserved (both engines serialize maps in insertion order).

Deterministic: same input → byte-identical parquet content.
Dev-only tool — the engine itself never depends on this file.
"""
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "..", "src", "main", "resources", "bangumi",
                   "items.jsonl")
OUT = os.path.join(HERE, "fixtures", "bangumi_parsed.parquet")


def parse_infobox(infobox):
    """Reference bangumi_data_ingestion.py:263-295, verbatim semantics."""
    if infobox is None:
        return None
    result = {}
    for item in infobox:
        key = (item.get("key") or "").strip()
        if not key:
            continue
        value = item.get("value")
        if isinstance(value, list):
            extracted = []
            for v in value:
                if isinstance(v, dict):
                    extracted.append(v.get("v", str(v)))
                else:
                    extracted.append(str(v))
            value = ", ".join(extracted) if extracted else None
        elif isinstance(value, dict):
            value = value.get("v", str(value))
        elif value is not None:
            value = str(value).strip()
        if value:
            result[key] = value
    return result


def parse_tags(tags):
    """Spark from_json PERMISSIVE for array<struct<name string,count int>>:
    any non-object element nullifies the whole array field."""
    if not isinstance(tags, list):
        return None
    if not all(isinstance(t, dict) for t in tags):
        return None
    return [{"name": t.get("name"), "count": t.get("count")} for t in tags]


def main():
    rows = []
    with open(SRC, encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            item = json.loads(line)
            s = item.get("subject") or {}
            ib = parse_infobox(s.get("infobox"))
            rows.append({
                "subject_type": item.get("subject_type"),
                "collection_type": item.get("type"),
                "ep_status": item.get("ep_status"),
                "vol_status": item.get("vol_status"),
                "created_at_raw": item.get("created_at"),
                "updated_at_raw": item.get("updated_at"),
                "s_id": s.get("id"),
                "s_name": s.get("name"),
                "s_name_cn": s.get("name_cn"),
                "s_score": s.get("score"),
                "s_rank": s.get("rank"),
                "s_collection_total": s.get("collection_total"),
                "s_eps": s.get("eps"),
                "s_volumes": s.get("volumes"),
                "s_date": s.get("date"),
                "s_type": s.get("type"),
                "s_short_summary": s.get("short_summary"),
                "tags": parse_tags(s.get("tags")),
                "infobox": list(ib.items()) if ib is not None else None,
            })

    schema = pa.schema([
        ("subject_type", pa.int32()),
        ("collection_type", pa.int32()),
        ("ep_status", pa.int32()),
        ("vol_status", pa.int32()),
        ("created_at_raw", pa.string()),
        ("updated_at_raw", pa.string()),
        ("s_id", pa.int64()),
        ("s_name", pa.string()),
        ("s_name_cn", pa.string()),
        ("s_score", pa.float64()),
        ("s_rank", pa.int32()),
        ("s_collection_total", pa.int64()),
        ("s_eps", pa.int32()),
        ("s_volumes", pa.int32()),
        ("s_date", pa.string()),
        ("s_type", pa.int32()),
        ("s_short_summary", pa.string()),
        ("tags", pa.list_(pa.struct([("name", pa.string()),
                                     ("count", pa.int32())]))),
        ("infobox", pa.map_(pa.string(), pa.string())),
    ])
    table = pa.Table.from_pylist(rows, schema=schema)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT)
    print(f"wrote {len(rows)} rows -> {OUT}")


if __name__ == "__main__":
    main()
