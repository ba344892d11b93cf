#!/usr/bin/env python3
"""Adversarial mega-stratum fixture: derive a documents table from an
existing scale fixture with a DEGENERATE stratum — a fixed fraction of
docs replaced by one byte-identical boilerplate text — so every one of
the boilerplate docs lands in the SAME MinHash band bucket in EVERY
band. This is the worst case for the band-bucket occupancy cap
(Dedup.capBandBuckets): the window must route all of the stratum's
band rows through single sorted-run tasks before dropping them.

Driver-side tooling only (like gen_scale_fixture.py) — never a library
input. Usage:
  python3 scripts/gen_adversarial_fixture.py [srcDir] [outDir] [frac]
defaults: /tmp/graft_sf10 /tmp/graft_adv 0.30
"""
import sys

import pyarrow.parquet as pq
import pyarrow as pa

BOILERPLATE = ("this content is provided as is without warranty of any "
               "kind either express or implied including but not limited "
               "to the implied warranties of merchantability fitness for "
               "a particular purpose or non infringement all rights "
               "reserved unauthorized reproduction is prohibited")


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf10"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_adv"
    frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.30
    import os
    os.makedirs(out, exist_ok=True)
    tbl = pq.read_table(f"{src}/documents.parquet")
    step = max(2, round(1.0 / frac))
    texts = tbl.column("text").to_pylist()
    ids = tbl.column("doc_id").to_pylist()
    # deterministic stratum: every step-th doc becomes the boilerplate
    n_hit = 0
    for i, d in enumerate(ids):
        if d % step == 0:
            texts[i] = BOILERPLATE
            n_hit += 1
    cols = {name: tbl.column(name) for name in tbl.column_names}
    cols["text"] = pa.array(texts, pa.string())
    cols["n_chars"] = pa.array([len(t) for t in texts], pa.int64())
    pq.write_table(pa.table(cols), f"{out}/documents.parquet")
    print(f"{out}/documents.parquet: {len(ids)} docs, "
          f"{n_hit} ({100.0 * n_hit / len(ids):.1f}%) byte-identical boilerplate")


if __name__ == "__main__":
    main()
