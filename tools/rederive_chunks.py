#!/usr/bin/env python3
"""Independent re-derivation for the q39_rolling_chunks golden pin.

GoldenSpec's md5 pin for q39 was generated from the Scala implementation,
which makes it a regression lock but not a correctness proof. This script
converts it into one: it re-runs the whole q39 query — content-defined
chunking over the sf0.01 documents table, then the shared-chunk aggregation
— in pure Python and checks that the canonical md5 equals the pinned value.
No Spark, no repo Scala.

The chunker here is the RollingChunksSpec reference chunker, ported: at
every byte position it recomputes the polynomial hash of the trailing
`window` bytes FROM SCRATCH (O(n·window)), rather than rolling it
incrementally the way the Catalyst expression does — so an off-by-one in
the expression's incremental subtraction (bPow, the i-start >= window
guard, the boundary reset) cannot be reproduced here. Semantics:

  - byte stream = UTF-8 encoding of the document text;
  - hash = polynomial with base 257 over the trailing `window` bytes,
    64-bit wrapping arithmetic (Scala Long semantics);
  - a cut is declared at position i when the current chunk is at least
    `window` bytes long and the window hash has `maskBits` low zero bits,
    or at end-of-input;
  - chunk fingerprint = md5 hex of the chunk's bytes.

Query (SparkEntry q39): explode per-doc chunk fingerprints, group by
fingerprint, n_docs = row count (NOT distinct docs — a doc repeating a
chunk contributes once per occurrence), first_doc = min doc_id, keep
n_docs > 1.

Canonical form (GoldenSpec.goldenHash): columns sorted by name
(chunk_fp, first_doc, n_docs), values cast to string, null -> "\x00",
cells joined with "\x01", lines sorted, md5 over line+"\n" UTF-8 bytes.
(The \x00/\x01 are literal control characters in GoldenSpec's source.)

Usage: python3 tools/rederive_chunks.py   (exits nonzero on mismatch)
"""
import hashlib
import sys

import duckdb

PINNED = "91f512381d6f520643326b0f5894567b"
SF_DIR = "/root/testdata/sf0.01"
WINDOW = 16
MASK_BITS = 6

M64 = (1 << 64) - 1


def chunks(text: str, window: int = WINDOW, mask_bits: int = MASK_BITS):
    """Per-position-recompute reference chunker (RollingChunksSpec port)."""
    data = text.encode("utf-8")
    mask = (1 << mask_bits) - 1

    def window_hash(i: int) -> int:
        h = 0
        for j in range(i - window + 1, i + 1):
            h = (h * 257 + data[j]) & M64
        return h

    out = []
    start = 0
    for i in range(len(data)):
        chunk_len = i - start + 1
        cut = (chunk_len >= window and (window_hash(i) & mask) == 0) or (
            i == len(data) - 1
        )
        if cut:
            out.append(hashlib.md5(data[start : i + 1]).hexdigest())
            start = i + 1
    return out


def main() -> int:
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    print(f"[chunks] {len(rows)} documents from {SF_DIR}")

    # explode → group by fingerprint: n_docs = occurrence count, min doc_id
    agg: dict[str, list[int]] = {}
    for doc_id, text in rows:
        for fp in chunks("" if text is None else text):
            if fp in agg:
                agg[fp][0] += 1
                if doc_id < agg[fp][1]:
                    agg[fp][1] = doc_id
            else:
                agg[fp] = [1, doc_id]

    shared = {fp: v for fp, v in agg.items() if v[0] > 1}
    print(f"[chunks] {len(agg)} distinct chunks, {len(shared)} shared")

    # canonical render: columns sorted by name = chunk_fp, first_doc, n_docs
    lines = sorted(
        f"{fp}\x01{first_doc}\x01{n_docs}"
        for fp, (n_docs, first_doc) in shared.items()
    )
    md = hashlib.md5()
    for line in lines:
        md.update((line + "\n").encode("utf-8"))
    got = md.hexdigest()

    if got == PINNED:
        print(f"[chunks] OK — canonical md5 {got} matches the GoldenSpec pin")
        return 0
    print(f"[chunks] MISMATCH — got {got}, pinned {PINNED}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
