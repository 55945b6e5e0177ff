#!/usr/bin/env python3
"""Export the q83 (deflate ratio) and q39 (rolling chunks) re-derivations
as TYPED parquet fixtures keyed by md5(text).

Both lanes were rows-only + GoldenSpec-md5-pinned (DuckDB has no zlib and
no per-byte rolling hash), each with an independent pure-Python
re-derivation (tools/rederive_deflate.py / rederive_chunks.py). This script
carries them into the driver's hash gate with the qb34 precedent: the
non-SQL boundary — CPython zlib compressed sizes, reference-chunker
fingerprints — is exported per DISTINCT TEXT (keyed by md5 of the UTF-8
bytes, so one fixture serves every scale factor whose texts it covers:
sf0.001/0.01/0.1 are all baked in), and SparkEntry.oracleSql replays the
lane's relational tail in DuckDB over `documents JOIN fixture ON
md5(text)` — the ratio arithmetic and the shared-chunk aggregation run
live in SQL at whatever SF the gate uses.

Linkage to the pins: before writing, both lanes are re-assembled from the
typed fixture rows at sf0.01 and their canonical md5s MUST equal the
pinned values from the rederive scripts.

Usage: python3 tools/gen_text_fixtures.py
"""
import hashlib
import os
import sys
import zlib
from decimal import Decimal, ROUND_HALF_UP

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import rederive_chunks as rc  # noqa: E402
import rederive_deflate as rd  # noqa: E402

SFS = ["sf0.001", "sf0.01", "sf0.1"]
PIN_SF = "/root/testdata/sf0.01"
HERE = os.path.dirname(os.path.abspath(__file__))
FIXDIR = os.path.join(HERE, "fixtures")


def all_texts():
    """distinct (text_md5, text) across every covered SF."""
    seen = {}
    for sf in SFS:
        rows = duckdb.sql(
            f"SELECT text FROM read_parquet('/root/testdata/{sf}/documents.parquet')"
        ).fetchall()
        for (text,) in rows:
            t = "" if text is None else text
            k = hashlib.md5(t.encode("utf-8")).hexdigest()
            seen.setdefault(k, t)
    return seen


def main() -> int:
    texts = all_texts()
    print(f"[text-fixtures] {len(texts)} distinct texts across {SFS}")

    deflate_rows = []
    chunk_rows = []
    for k, t in texts.items():
        raw = t.encode("utf-8")
        deflated = len(zlib.compress(raw, 6))
        # Decimal(repr(x)), NOT Decimal(x): Scala BigDecimal(double) rounds
        # the SHORTEST-repr decimal (Double.toString / valueOf), not the
        # exact binary expansion — they disagree exactly at HALF_UP
        # boundaries (0.63125 -> 0.6313 vs 0.6312; hit at sf0.1)
        ratio = float(
            Decimal(repr(deflated / max(len(raw), 1))).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP))
        deflate_rows.append(dict(text_md5=k, n_bytes=len(raw),
                                 n_deflated=deflated, ratio=ratio))
        for occ, fp in enumerate(rc.chunks(t)):
            chunk_rows.append(dict(text_md5=k, occ=occ, chunk_fp=fp))

    # ---- pin linkage at sf0.01 (the gate's SF) ----
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{PIN_SF}/documents.parquet')"
    ).fetchall()
    dmap = {r["text_md5"]: r for r in deflate_rows}
    lines = []
    for doc_id, text in docs:
        k = hashlib.md5(("" if text is None else text).encode("utf-8")).hexdigest()
        r = dmap[k]
        lines.append("\x01".join([str(doc_id), str(r["n_bytes"]),
                                  str(r["n_deflated"]),
                                  rd.render_double(r["ratio"])]))
    md = hashlib.md5()
    for line in sorted(lines):
        md.update((line + "\n").encode("utf-8"))
    ok83 = md.hexdigest() == rd.PINNED
    print(f"[text-fixtures] {'OK  ' if ok83 else 'MISS'} q83 via fixture: "
          f"md5 {md.hexdigest()}")

    cmap = {}
    for r in chunk_rows:
        cmap.setdefault(r["text_md5"], []).append(r["chunk_fp"])
    agg = {}
    for doc_id, text in docs:
        k = hashlib.md5(("" if text is None else text).encode("utf-8")).hexdigest()
        for fp in cmap.get(k, []):
            if fp in agg:
                agg[fp][0] += 1
                agg[fp][1] = min(agg[fp][1], doc_id)
            else:
                agg[fp] = [1, doc_id]
    lines39 = sorted(f"{fp}\x01{first}\x01{n}"
                     for fp, (n, first) in agg.items() if n > 1)
    md39 = hashlib.md5()
    for line in lines39:
        md39.update((line + "\n").encode("utf-8"))
    ok39 = md39.hexdigest() == rc.PINNED
    print(f"[text-fixtures] {'OK  ' if ok39 else 'MISS'} q39 via fixture: "
          f"md5 {md39.hexdigest()}")

    if not (ok83 and ok39):
        print("[text-fixtures] pin mismatch — NOT writing", file=sys.stderr)
        return 1

    os.makedirs(FIXDIR, exist_ok=True)
    pq.write_table(pa.Table.from_pylist(deflate_rows, schema=pa.schema([
        ("text_md5", pa.string()), ("n_bytes", pa.int32()),
        ("n_deflated", pa.int32()), ("ratio", pa.float64())])),
        os.path.join(FIXDIR, "deflate_by_text.parquet"))
    pq.write_table(pa.Table.from_pylist(chunk_rows, schema=pa.schema([
        ("text_md5", pa.string()), ("occ", pa.int32()),
        ("chunk_fp", pa.string())])),
        os.path.join(FIXDIR, "chunks_by_text.parquet"))
    print(f"[text-fixtures] wrote {len(deflate_rows)} deflate rows, "
          f"{len(chunk_rows)} chunk rows -> {FIXDIR}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
