#!/usr/bin/env python3
"""Engine-vs-DuckDB GPT-2 pretokenization parity over randomized edge cases.

BpePretokOracleParitySpec writes target/pretok_parity/:
  documents.parquet     — (doc_id, text) randomized edge-case texts
  engine_stream.parquet — the ENGINE's (doc_id, n_pretokens, pretoks_md5)
  probe.sql             — Bpe.oraclePretokenStreamSql (the oPretoks rewrite)

This tool runs probe.sql in real DuckDB over documents and compares the
streams row by row — the part the in-JVM simulation cannot prove
(RE2 semantics, DuckDB list/CASE evaluation). Run after `sbt test`:

    python3 tools/pretok_parity.py
"""
import glob
import os
import sys

import duckdb
import pandas as pd

base = os.path.join(os.path.dirname(__file__), "..", "target", "pretok_parity")
if not os.path.isdir(base):
    sys.exit("fixture missing - run `sbt 'testOnly graft.BpePretokOracleParitySpec'` first")

con = duckdb.connect()
doc = sorted(glob.glob(os.path.join(base, "documents.parquet", "*.parquet")))
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet({doc!r})")
sql = open(os.path.join(base, "probe.sql")).read()
oracle = con.sql(sql).df().sort_values("doc_id").reset_index(drop=True)
engine = pd.concat([
    pd.read_parquet(p)
    for p in sorted(glob.glob(os.path.join(base, "engine_stream.parquet", "*.parquet")))
]).sort_values("doc_id").reset_index(drop=True)

assert len(oracle) == len(engine), (len(oracle), len(engine))
bad = 0
for i in range(len(engine)):
    e, o = engine.iloc[i], oracle.iloc[i]
    if e.n_pretokens != o.n_pretokens or e.pretoks_md5 != o.pretoks_md5:
        bad += 1
        text = con.sql(f"SELECT text FROM documents WHERE doc_id = {e.doc_id}").fetchone()[0]
        print(f"FAIL doc {e.doc_id}: engine ({e.n_pretokens}, {e.pretoks_md5}) "
              f"vs duckdb ({o.n_pretokens}, {o.pretoks_md5}) text={text!r}")
print(f"{len(engine) - bad}/{len(engine)} rows match")
sys.exit(1 if bad else 0)
