#!/usr/bin/env python3
"""10x TPC-H join fixture: replicate sf0.1 lineitem+orders with shifted
order keys so the fact-fact join tier is 10x the bench tier. Driver-side
tooling only (like gen_scale_fixture.py) — never a library input. Used
by ScaleProbe's bkt_join_* tags to measure what a bucketed layout buys
the repeated fact-fact join (PERF.md).

Usage: python3 scripts/gen_tpch_scale_fixture.py [srcDir] [outDir] [mult]
defaults: /root/testdata/sf0.1 /tmp/graft_sf10 10
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf10"
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os
    os.makedirs(out, exist_ok=True)
    orders = pq.read_table(f"{src}/orders.parquet")
    li = pq.read_table(f"{src}/lineitem.parquet")
    shift = int(pc.max(orders.column("o_orderkey")).as_py()) + 1
    for name, tbl, key in (("orders", orders, "o_orderkey"),
                           ("lineitem", li, "l_orderkey")):
        copies = []
        for i in range(mult):
            t = tbl.set_column(
                tbl.schema.get_field_index(key), key,
                pc.add(tbl.column(key), i * shift))
            copies.append(t)
        big = pa.concat_tables(copies)
        pq.write_table(big, f"{out}/{name}.parquet")
        print(f"{name}: {big.num_rows} rows -> {out}/{name}.parquet")


if __name__ == "__main__":
    main()
