#!/usr/bin/env python3
"""Generate 1x/2x/4x scaled copies of the sf0.1 documents table for the
near-dup scaling probe (DESIGN.md "Measured scaling slope").

Each extra copy token-suffixes its text (`tok` -> `tok_cN`) so copies
share NO shingles with each other: duplicate-group structure (and
near-dup pair density) stays constant per copy instead of exploding
quadratically, which would measure the workload change, not the engine.

Usage: python3 tools/gen_scale_corpora.py [outdir=/tmp/scale]
Then:  sbt "runMain graft.tools.ScaleProbe /tmp/scale/x1 /tmp/scale/x2 /tmp/scale/x4"

Dev tool only — never shipped in the engine jar.
"""
import sys, os
import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale"
src = "/root/testdata/sf0.1/documents.parquet"
con = duckdb.connect()
for name, copies in [("x1", 1), ("x2", 2), ("x4", 4), ("x10", 10)]:
    d = os.path.join(out, name)
    os.makedirs(d, exist_ok=True)
    selects = []
    for c in range(copies):
        if c == 0:
            selects.append(f"SELECT doc_id, text, lang, source, n_chars FROM '{src}'")
        else:
            selects.append(
                f"SELECT doc_id + {c * 1000000}, "
                f"regexp_replace(text, '(\\S+)', '\\1_c{c}', 'g') AS text, "
                f"lang, source, n_chars FROM '{src}'")
    q = " UNION ALL ".join(selects)
    con.execute(f"COPY ({q}) TO '{d}/documents.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{d}/documents.parquet'").fetchone()[0]
    print(name, n, "docs")
    # embeddings for the ANN-build probes (j53/j196): each extra copy
    # ROTATES the vector by c dims so copies land in different LSH
    # buckets — growth measures the engine, not duplicate pileup
    esrc = "/root/testdata/sf0.1/embeddings.parquet"
    eselects = []
    for c in range(copies):
        if c == 0:
            eselects.append(f"SELECT vec_id, embedding, label FROM '{esrc}'")
        else:
            eselects.append(
                f"SELECT vec_id + {c * 1000000}, "
                f"embedding[{c + 1}:] || embedding[:{c}] AS embedding, "
                f"label FROM '{esrc}'")
    eq = " UNION ALL ".join(eselects)
    con.execute(f"COPY ({eq}) TO '{d}/embeddings.parquet' (FORMAT PARQUET)")
    en = con.execute(f"SELECT count(*) FROM '{d}/embeddings.parquet'").fetchone()[0]
    print(name, en, "vecs")
    # events for the TS-rollup / EQL-sequence / sessionize probes (r12 —
    # the r11 verdict's evidence gap): each extra copy SHIFTS user_id
    # (the series/sequence/session key) and event_id, keeping ts and the
    # per-user event mix untouched — the series COUNT scales linearly
    # while per-series density stays constant, so growth measures the
    # engine, not a densifying workload.
    vsrc = "/root/testdata/sf0.1/events.parquet"
    vselects = []
    for c in range(copies):
        if c == 0:
            vselects.append(f"SELECT * FROM '{vsrc}'")
        else:
            vselects.append(
                f"SELECT event_id + {c * 10000000}, ts, "
                f"user_id + {c * 1000000}, event_type, value, props "
                f"FROM '{vsrc}'")
    vq = " UNION ALL ".join(vselects)
    con.execute(f"COPY ({vq}) TO '{d}/events.parquet' (FORMAT PARQUET)")
    vn = con.execute(f"SELECT count(*) FROM '{d}/events.parquet'").fetchone()[0]
    print(name, vn, "events")
