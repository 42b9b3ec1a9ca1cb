#!/usr/bin/env python3
"""Deterministic 10x scale-up of sf0.1 into $OUT (default
/root/scale_data/sf1) for SCALING MEASUREMENT ONLY (VERDICT r11 #6:
capture the 8-vs-32-core block at a data-bound SF). Never used by the
driver's bench/oracle (those read /root/testdata, which stays
untouched); replica keys are shifted so join fan-outs stay ~constant
per key, document text is salted per replica so near-dup structure
stays ~linear, dimension tables (region/nation/part/supplier) keep
their size like TPC-H's fixed dims."""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/scale_data/sf1"
REPS = int(os.environ.get("SCALE_REPS", "10"))
os.makedirs(OUT, exist_ok=True)

SHIFTS = {  # column -> per-replica key offset
    "customer": {"c_custkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
COPY = ["region", "nation", "part", "supplier"]

for name in COPY:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    pq.write_table(t, f"{OUT}/{name}.parquet")
    print(f"{name}: copied {t.num_rows}")

for name, shifts in SHIFTS.items():
    t = pq.read_table(f"{SRC}/{name}.parquet")
    parts = []
    for rep in range(REPS):
        r = t
        for col, off in shifts.items():
            if rep:
                i = r.schema.get_field_index(col)
                shifted = pc.add(r.column(col), pa.scalar(rep * off, type=r.schema.field(col).type))
                r = r.set_column(i, r.schema.field(col), shifted)
        if name == "documents" and rep:
            # salt text per replica: identical clones across replicas
            # would make LSH candidate pairs grow quadratically in REPS
            i = r.schema.get_field_index("text")
            salted = pc.binary_join_element_wise(
                r.column("text").cast(pa.string()), f"r{rep}", " "
            )
            r = r.set_column(i, r.schema.field("text"), salted.cast(r.schema.field("text").type))
        parts.append(r)
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{OUT}/{name}.parquet", row_group_size=200_000)
    print(f"{name}: {t.num_rows} -> {out.num_rows}")
