#!/usr/bin/env python3
"""Independent re-derivation for the q83_deflate_ratio golden pin.

GoldenSpec's md5 pin for q83 was generated from the Scala implementation,
which makes it a regression lock but not a correctness proof. This script
converts it into one: it recomputes every (n_bytes, n_deflated, ratio) row
with CPython's zlib (level 6, default strategy/window — the same underlying
zlib the JVM's java.util.zip.Deflater binds) over the sf0.01 documents
table, renders the result in GoldenSpec's canonical form (columns sorted by
name → doc_id, n_bytes, n_deflated, ratio; values as strings; cells joined
with \x01; rows sorted; md5 over line+"\n"), and checks the hash equals the
pinned value. No Spark, no repo Scala.

Rendering notes:
  - ratio is rounded HALF_UP to 4dp (the Scala BigDecimal rule); rendered
    the way java.lang.Double.toString renders (shortest round-trip —
    repr() in Python 3 matches for these magnitudes, with the same
    integral-value ".0" suffix).

Usage: python3 tools/rederive_deflate.py   (exits nonzero on mismatch)
"""
import hashlib
import sys
import zlib
from decimal import Decimal, ROUND_HALF_UP

import duckdb

PINNED = "050d0c85f3ccd39c668e09c5d241fbdf"
SF_DIR = "/root/testdata/sf0.01"


def render_double(x: float) -> str:
    # java.lang.Double.toString: shortest decimal that round-trips, always
    # with a fractional part. Python's repr is the same algorithm; only the
    # integral-value suffix differs ("1.0" both ways — fine).
    return repr(x)


def main() -> int:
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'").fetchall()
    lines = []
    for doc_id, text in rows:
        raw = (text or "").encode("utf-8")
        deflated = len(zlib.compress(raw, 6))
        # Decimal(repr(x)), NOT Decimal(x): Scala BigDecimal(double) rounds
        # the SHORTEST-repr decimal (Double.toString / valueOf), not the
        # exact binary expansion — they disagree exactly at HALF_UP
        # boundaries (0.63125 -> 0.6313 vs 0.6312; hit at sf0.1)
        ratio = float(
            Decimal(repr(deflated / max(len(raw), 1))).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP))
        # canonical form (GoldenSpec / rederive_goldens.py): cells in
        # column-name order joined with \x01
        lines.append("\x01".join([
            str(doc_id), str(len(raw)), str(deflated), render_double(ratio)]))
    md = hashlib.md5()
    for line in sorted(lines):
        md.update((line + "\n").encode("utf-8"))
    got = md.hexdigest()
    if got != PINNED:
        print(f"MISMATCH: recomputed {got}, pinned {PINNED}", file=sys.stderr)
        return 1
    print(f"OK: q83_deflate_ratio pin {PINNED} independently re-derived "
          f"({len(lines)} rows, CPython zlib)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
