#!/usr/bin/env python3
"""Scale-evidence fixture: a 10×-sf0.1 documents+embeddings tier under
/tmp, mimicking the driver's sf0.1 distributions (same vocab, language
mix, 20 sources, clustered embeddings, a seeded dup/near-dup tail).

Driver-side tooling only (like selfcheck.py) — never a library input.
The correctness contract stays on /root/testdata; this exists so
PERF.md can report how the document/embedding operator family scales
one order of magnitude past the bench tier.

Usage: python3 scripts/gen_scale_fixture.py [outDir] [mult]
"""
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("join hash row batch scan customer column filter small slow merge "
         "order vector line table data agg value key stream window spark a "
         "part group query big fast sort the".split())
LANGS = [("en", 0.41), ("zh", 0.15), ("es", 0.15), ("fr", 0.15), ("de", 0.14)]


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rng = random.Random(42)
    n_docs, n_sources = 5000 * mult, 20
    n_vecs, dim, n_labels = 2000 * mult, 64, 10

    import os
    os.makedirs(out, exist_ok=True)

    # zipf-ish token draws like the observed sf0.1 token histogram
    weights = [1.0 / (i + 3) ** 0.3 for i in range(len(VOCAB))]
    docs = []
    for i in range(n_docs):
        n_tok = rng.randint(25, 95)
        text = " ".join(rng.choices(VOCAB, weights=weights, k=n_tok))
        docs.append(text)
    # seeded duplicate tail (~0.2% exact dups, ~0.3% near-dups), same
    # order of magnitude as the driver's fixture
    for j in range(n_docs // 500):
        docs[rng.randrange(n_docs)] = docs[rng.randrange(n_docs)]
    for j in range(n_docs // 330):
        src = docs[rng.randrange(n_docs)].split()
        src[rng.randrange(len(src))] = rng.choice(VOCAB)
        docs[rng.randrange(n_docs)] = " ".join(src)

    langs = rng.choices([l for l, _ in LANGS], weights=[w for _, w in LANGS],
                        k=n_docs)
    tbl = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(docs, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array([f"src{i % n_sources}" for i in range(n_docs)],
                           pa.string()),
        "n_chars": pa.array([len(t) for t in docs], pa.int64()),
    })
    pq.write_table(tbl, f"{out}/documents.parquet")

    nrng = np.random.default_rng(42)
    centroids = nrng.normal(size=(n_labels, dim)).astype(np.float32)
    labels = nrng.integers(0, n_labels, size=n_vecs)
    # noise σ sized so cosine pair density at the 0.45 near-dup
    # threshold matches the driver's embeddings (~0.05-0.1 pairs/vec,
    # NOT tight clusters — a tight fixture makes the RESULT SET itself
    # quadratic, which no index can fix): within-cluster cosine ≈
    # 1/(1+σ²) ≈ 0.14 with a thin tail over the threshold
    vecs = centroids[labels] + 2.5 * nrng.normal(
        size=(n_vecs, dim)).astype(np.float32)
    emb = pa.table({
        "vec_id": pa.array(range(n_vecs), pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })
    pq.write_table(emb, f"{out}/embeddings.parquet")
    print(f"wrote {n_docs} docs / {n_vecs} vecs to {out}")


if __name__ == "__main__":
    main()
