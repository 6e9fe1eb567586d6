#!/usr/bin/env python3
"""Regenerate the golden row-count resource from a Verify output dir.

Usage: run Verify at sf0.001 first, then:
    python3 tools/regen_goldens.py /tmp/v001

ONLY regenerate after the parity check (tools/check.py) is green — the
goldens exist to pin DuckDB-verified behavior, not whatever Spark
currently emits.
"""
import sys, os, json
import pyarrow.parquet as pq

outdir = sys.argv[1]
dest = os.path.join(os.path.dirname(__file__), "..",
                    "src/test/resources/golden/rowcounts_sf0.001.json")
counts = {}
for name in sorted(os.listdir(outdir)):
    qd = os.path.join(outdir, name)
    if os.path.isdir(qd):
        counts[name] = pq.read_table(qd).num_rows
with open(dest, "w") as f:
    json.dump(counts, f, indent=1, sort_keys=True)
print(f"wrote {len(counts)} golden row counts to {dest}")
