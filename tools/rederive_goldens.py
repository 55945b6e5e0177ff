#!/usr/bin/env python3
"""Independent golden re-derivation for the qb34–qb38 fixture pins.

GoldenSpec's md5 pins for the Bangumi fixture lanes were generated from the
Scala implementation itself, which makes them a regression lock but not a
correctness proof. This script converts them into one: it replays the fixture
JSONL through a from-scratch Python reimplementation of the REFERENCE
pipeline's transforms (/root/reference/bangumi_data_ingestion.py — field
extraction :309-323, infobox flatten :263-294, top-tag pivot :297-306,
raw/analytics projections :391-461, category summary :487-499, quality rules
per Documentation.docx §4.4) and checks that the canonical md5 of the result
equals the pinned hash. No Spark, no repo Scala — if the Scala drifted from
the reference semantics, the hashes diverge here.

Engine-encoding rules (presentation, not semantics — where the reference's
pandas/json.dumps rendering and a typed-columnar engine's rendering are both
faithful encodings of the same values, we render the engine way, since the
pins hash engine output):

  C1  typed-array coercion: `subject.tags` is schema-typed
      array<struct<name:string,count:int>>. A structurally-invalid element
      (e.g. the bare string in subject 104's tag list) nulls the whole array
      — verified Spark `from_json` PERMISSIVE behavior. (The reference would
      CRASH on that row: its `t.get("name")` at :457 raises AttributeError
      on a non-dict tag. The engine's documented coercion is strictly more
      robust; this script applies C1 and flags the affected rows.)
  C2  JSON rendering: compact separators, non-ASCII preserved, struct
      fields in schema order with null fields omitted (Spark `to_json`).
  C3  `infobox_raw` stores the reference's OWN flatten (parse_infobox
      :263-294) rendered per C2 in insertion order, rather than a dump of
      the raw polymorphic list — same information, typed encoding.

Canonical form (must match GoldenSpec.goldenHash exactly): columns sorted by
name, every value cast to string, null -> \\x00, cells joined with \\x01,
lines sorted, md5 over line+"\\n" UTF-8 bytes.

Usage: python3 tools/rederive_goldens.py   (exits nonzero on any mismatch)
"""

import hashlib
import json
import re
import sys
from datetime import datetime

FIXTURE = "src/main/resources/bangumi/items.jsonl"
NULL = "\x00"
SEP = "\x01"

# The pinned hashes from src/test/scala/graft/GoldenSpec.scala.
PINS = {
    "qb34_bangumi_raw": "f3ea43e47563c76ba2435c740d840756",
    "qb35_bangumi_analytics": "7a2c730afc1369dc7d70f8d115801db1",
    "qb36_bangumi_summary": "32ad3034e6c4b75d72448d673a986621",
    "qb37_bangumi_quality": "46a8a8a8705aee6c487bc1a45eb9a975",
    "qb38_bangumi_source": "46649031339b29c645ef3351abe1c848",
}

# reference :26-41 (docx §6.1) — label maps used by the summary sheet
SUBJECT_TYPE_LABELS = {1: "书籍/Books", 2: "动画/Anime", 3: "音乐/Music",
                       4: "游戏/Games", 6: "三次元/Real"}
COLLECTION_TYPE_LABELS = {1: "想看/Want", 2: "看过/Watched", 3: "在看/Watching",
                          4: "搁置/On-hold", 5: "抛弃/Dropped"}
# reference :44-45 — the category grid the connector collects
SUBJECT_TYPES = [1, 2, 3]
COLLECTION_TYPES = [1, 2, 3, 4]


def jdump(x):
    """C2: the engine's compact JSON rendering."""
    return json.dumps(x, ensure_ascii=False, separators=(",", ":"))


def parse_infobox(infobox):
    """Reference parse_infobox (:263-294), reimplemented line-for-line from
    its described behavior: strip/skip blank keys, flatten list values by
    joining their `v` fields with ", ", unwrap dict values via `v`,
    stringify scalars, drop falsy values."""
    result = {}
    if not infobox:
        return result
    for item in infobox:
        key = (item.get("key") or "").strip()
        if not key:
            continue
        value = item.get("value")
        if isinstance(value, list):
            extracted = [v.get("v", str(v)) if isinstance(v, dict) else str(v)
                         for v in value]
            value = ", ".join(extracted) if extracted else None
        elif isinstance(value, dict):
            value = value.get("v", str(value))
        elif value is not None:
            value = str(value).strip()
        if value:
            result[key] = value
    return result


def typed_tags(tags):
    """C1: the typed-schema view of the tag list. None/invalid -> None."""
    if tags is None:
        return None
    out = []
    for t in tags:
        if not isinstance(t, dict):
            return None  # C1: malformed element nulls the array
        out.append({"name": t.get("name"), "count": t.get("count")})
    return out


def parse_naive_ts(s):
    """Reference :397-402: pd.to_datetime(errors='coerce') then
    tz_localize(None) — i.e. keep the literal wall clock, coerce garbage to
    null."""
    if s is None:
        return None
    s = re.sub(r"(Z|z|[+-]\d{2}:?\d{2})$", "", s.strip())
    try:
        return datetime.fromisoformat(s)
    except ValueError:
        return None


def extract_top_tags(tags):
    """Reference extract_top_tags (:297-306) over the typed view (C1)."""
    tags = tags or []
    out = {}
    for i in range(5):
        t = tags[i] if i < len(tags) else None
        out[f"tag_{i+1}_name"] = t["name"] if t else None
        out[f"tag_{i+1}_count"] = t["count"] if t else None
    return out


def load_items():
    with open(FIXTURE, encoding="utf-8") as f:
        return [json.loads(line) for line in f if line.strip()]


def raw_row(item, user_id="graft"):
    """Reference raw projection (:409-431)."""
    subject = item.get("subject") or {}
    ttags = typed_tags(subject.get("tags"))
    names = [t["name"] for t in (ttags or [])]
    ibx = parse_infobox(subject.get("infobox"))
    summary = (subject.get("short_summary") or "")
    return {
        "user_id": user_id,
        "subject_id": subject.get("id"),
        "subject_type": item.get("subject_type"),
        "collection_type": item.get("type"),
        "created_at": parse_naive_ts(item.get("created_at")),
        "updated_at": parse_naive_ts(item.get("updated_at")),
        "ep_status": item.get("ep_status"),
        "vol_status": item.get("vol_status"),
        "name": subject.get("name"),
        "name_cn": subject.get("name_cn"),
        "score": subject.get("score"),
        "rank": subject.get("rank"),
        "collection_total": subject.get("collection_total"),
        "eps": subject.get("eps"),
        "volumes": subject.get("volumes"),
        "date": subject.get("date"),
        "type": subject.get("type"),
        "short_summary": summary[:500] if subject.get("short_summary") is not None else None,
        # qb34 JSON-encodes the name list for the driver's rows-only compare
        "tags": jdump(names),
        "tags_raw": jdump([{k: v for k, v in t.items() if v is not None}
                           for t in ttags]) if ttags else None,  # C2
        "infobox_raw": jdump(ibx) if ibx else None,  # C3
    }


def analytics_row(item):
    """Reference analytics projection (:433-461)."""
    subject = item.get("subject") or {}
    ttags = typed_tags(subject.get("tags"))
    ibx = parse_infobox(subject.get("infobox"))
    all_names = [t["name"] for t in (ttags or []) if t["name"]]
    row = {
        "subject_id": subject.get("id"),
        "subject_type": item.get("subject_type"),
        "collection_type": item.get("type"),
        "name_cn": subject.get("name_cn") or subject.get("name"),
        "score": subject.get("score"),
        "rank": subject.get("rank"),
        "collection_total": subject.get("collection_total"),
        "created_at": parse_naive_ts(item.get("created_at")),
        "updated_at": parse_naive_ts(item.get("updated_at")),
        "eps": subject.get("eps"),
        "air_date": subject.get("date"),
        "director": ibx.get("导演") or ibx.get("監督"),
        "studio": ibx.get("动画制作") or ibx.get("アニメーション制作"),
        "country": ibx.get("国家/地区") or ibx.get("国"),
        "publisher": ibx.get("出版社") or ibx.get("発売元"),
        "author": ibx.get("作者") or ibx.get("著者"),
    }
    row.update(extract_top_tags(ttags))
    # all_tags is None (not "") when nothing survives, and None when the
    # array is C1-nulled — matching `t.get("name")`-truthy filtering :457
    row["all_tags"] = ", ".join(all_names) if ttags and all_names else None
    return row


def summary_rows(analytics):
    """Reference category summary (:487-499): per-(st,ct) counts, mean
    score, top-1000 ranks; totals==fetched when replaying a full corpus."""
    groups = {}
    for r in analytics:
        groups.setdefault((r["subject_type"], r["collection_type"]), []).append(r)
    out = []
    for (st, ct), rows in groups.items():
        scores = [r["score"] for r in rows if r["score"] is not None]
        avg = round(sum(scores) / len(scores), 4) if scores else None
        out.append({
            "subject_type_label": SUBJECT_TYPE_LABELS.get(st),
            "collection_type_label": COLLECTION_TYPE_LABELS.get(ct),
            "subject_type": st,
            "collection_type": ct,
            "total_items": len(rows),
            "fetched_items": len(rows),
            "avg_score": avg,
            "top_ranked": sum(1 for r in rows
                              if r["rank"] is not None and r["rank"] <= 1000),
            "completion_pct": 100.0,
        })
    return out


def quality_row(raw):
    """Documentation.docx §4.4 quality rules over the raw projection."""
    ids = [r["subject_id"] for r in raw]
    return {
        "n_rows": len(raw),
        "n_distinct_ids": len({i for i in ids if i is not None})
                          + (1 if any(i is None for i in ids) else 0),
        "n_dup_rows": len(raw) - len(set(ids)),
        "n_null_ids": sum(1 for i in ids if i is None),
        "n_null_created": sum(1 for r in raw if r["created_at"] is None),
    }


def render(v):
    """Spark cast-to-string of one cell (GoldenSpec canonical form)."""
    if v is None:
        return NULL
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, float):
        return repr(v)  # shortest round-trip == Java Double.toString here
    return str(v)


def golden_hash(rows):
    cols = sorted(rows[0].keys()) if rows else []
    lines = sorted(SEP.join(render(r[c]) for c in cols) for r in rows)
    md = hashlib.md5()
    for line in lines:
        md.update((line + "\n").encode("utf-8"))
    return md.hexdigest()


def main():
    items = load_items()
    grid = [i for i in items
            if i.get("subject_type") in SUBJECT_TYPES
            and i.get("type") in COLLECTION_TYPES]

    raw = [raw_row(i) for i in items]
    analytics = [analytics_row(i) for i in items]
    derived = {
        "qb34_bangumi_raw": raw,
        "qb35_bangumi_analytics": analytics,
        "qb36_bangumi_summary": summary_rows(analytics),
        "qb37_bangumi_quality": [quality_row(raw)],
        # qb38 reads through the DSv2 source: only the reference's category
        # grid is fetched, so out-of-grid rows never reach the transforms
        "qb38_bangumi_source": [analytics_row(i) for i in grid],
    }

    failed = []
    for name, pin in PINS.items():
        got = golden_hash(derived[name])
        status = "OK  " if got == pin else "FAIL"
        if got != pin:
            failed.append(name)
        print(f"{status} {name}: rederived {got} pinned {pin}")
    if failed:
        print(f"\n{len(failed)} pin(s) diverge from the reference replay: "
              f"{', '.join(failed)}", file=sys.stderr)
        return 1
    print("\nAll pins independently re-derived from the reference transforms.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
