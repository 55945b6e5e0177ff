#!/usr/bin/env python3
"""Generate sf1 fixtures for the fourth-decade scaling sweep.

The driver provides sf0.001/0.01/0.1 only (TESTDATA.md). This tool
extends the two tables the expensive-lane sweep drives — `documents`
(5,000 → 50,000 rows) and `embeddings` (2,000 → 20,000) — by the SAME
generative process the driver's fixtures exhibit, measured from
/root/testdata/sf0.1 (seed 42, deterministic):

documents (reverse-engineered invariants, all verified by inspection):
  - 31-token vocabulary drawn near-uniformly, space-joined;
  - token count per doc ~ Uniform[10, 99] (observed min 10, mean 54.1);
  - lang ~ {en: .41, zh: .15, es: .15, fr: .15, de: .14};
  - source = f"src{doc_id % 20}" (exact in the driver data);
  - n_chars = len(text);
  - ~4.5% of docs are NEAR-DUP copies of an earlier doc with " dup"
    appended (observed: 216 two-doc 80-char-prefix families at sf0.1,
    tail delta ≈ one " dup" token, 2 exact-equal pairs) — this is the
    structure the dedup lanes' cost rides on, so the rate is held, not
    the row count.

embeddings: 64-dim unit-normalized gaussians (observed mean norm 1.0,
per-component std 0.125 ≈ 1/√64), label ~ Uniform{0..9} (labels are NOT
geometric clusters in the driver data — within/cross-label mean cosine
both ≈ 0); the first 20 vectors are duplicated verbatim at high ids to
mirror the q106 decontamination leak structure.

Output: /tmp/testdata_sf1/{documents,embeddings}.parquet. sf1 is a
LOCAL extension for slope confirmation only — never an oracle input.
"""
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

# Optional scale multiplier (default 1 → sf1). `gen_sf1.py 10` writes the
# FIFTH-decade fixture (sf10: 500k docs / 200k vecs) to /tmp/testdata_sf10
# by the identical generative process — same seed, same dup-family rate.
SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 1
OUT = f"/tmp/testdata_sf{SCALE}"
N_DOCS = 50_000 * SCALE
N_VECS = 20_000 * SCALE
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]


def gen_documents(rnd: random.Random):
    texts = []
    rows = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for i in range(N_DOCS):
        if i > 0 and rnd.random() < 0.045:
            # near-dup: copy an earlier doc, append " dup" (the driver
            # fixture's observed mutation), occasionally exactly equal
            src = rnd.randrange(len(texts))
            text = texts[src] + (" dup" if rnd.random() > 0.01 else "")
        else:
            n = rnd.randint(10, 99)
            text = " ".join(rnd.choice(VOCAB) for _ in range(n))
        texts.append(text)
        rows["doc_id"].append(i)
        rows["text"].append(text)
        rows["lang"].append(rnd.choices(LANGS, weights=LANG_W)[0])
        rows["source"].append(f"src{i % 20}")
        rows["n_chars"].append(len(text))
    return pa.table({
        "doc_id": pa.array(rows["doc_id"], pa.int64()),
        "text": pa.array(rows["text"], pa.string()),
        "lang": pa.array(rows["lang"], pa.string()),
        "source": pa.array(rows["source"], pa.string()),
        "n_chars": pa.array(rows["n_chars"], pa.int64()),
    })


def gen_embeddings(rnd: random.Random):
    vecs, labels = [], []
    for _ in range(N_VECS):
        v = [rnd.gauss(0.0, 1.0) for _ in range(64)]
        norm = sum(x * x for x in v) ** 0.5
        vecs.append([x / norm for x in v])
        labels.append(rnd.randrange(10))
    # mirror the decontamination-leak structure: the first 20 vectors
    # reappear verbatim late in the id space
    for j in range(20):
        vecs[N_VECS - 20 + j] = vecs[j]
    return pa.table({
        "vec_id": pa.array(range(N_VECS), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rnd = random.Random(42)
    pq.write_table(gen_documents(rnd), f"{OUT}/documents.parquet")
    pq.write_table(gen_embeddings(rnd), f"{OUT}/embeddings.parquet")
    print(f"[gen_sf1] wrote {N_DOCS} documents, {N_VECS} embeddings → {OUT}")


if __name__ == "__main__":
    main()
