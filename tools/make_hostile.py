#!/usr/bin/env python3
"""Generate hostile fixture variants of sf0.01 under target/hostile/.

Each variant is a full 10-table directory (schemas byte-compatible with
the driver fixtures) stressing one documented failure class:

  empty    - every table present with ZERO rows (schema-stable results?)
  single   - every table with exactly one row (degenerate aggregates)
  skew     - one events.user_id owns 50% of rows; one documents.source
             owns 50% of docs (hot-key shuffles, salting, caps)
  bigdoc   - documents plus one 10 MB text row (per-row memory, shingle
             explosion of a single doc)
  flatvec  - every embedding is the SAME vector (ANN pivots/codebooks
             degenerate, all-pairs cosine = 1)
  nullts   - events.ts all NULL (watermark columns are nullable by
             contract; every time op must drop, not crash)
  satvocab - documents x8 via per-replica token SHUFFLE of the 31-token
             corpus: the 3-gram space saturates, every shingle's df
             grows with n - the bounded-vocabulary regime where the
             bucket caps (not the exponent gate) are the defense

Usage: python3 tools/make_hostile.py [srcDir] [outRoot]
"""
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def read(src, t):
    return pq.read_table(f"{src}/{t}.parquet")


def write(out, t, table):
    os.makedirs(out, exist_ok=True)
    pq.write_table(table, f"{out}/{t}.parquet")


def copy_all(src, out, override=None):
    for t in TABLES:
        tab = read(src, t)
        if override and t in override:
            tab = override[t](tab)
        write(out, t, tab)


def main(src, root):
    # empty: zero-row slices keep schema + metadata
    copy_all(src, f"{root}/empty", {t: (lambda tab: tab.slice(0, 0)) for t in TABLES})
    # single: first row of each table
    copy_all(src, f"{root}/single", {t: (lambda tab: tab.slice(0, 1)) for t in TABLES})

    # skew: half of events to user 1, half of documents to one source
    def skew_events(tab):
        d = tab.to_pydict()
        n = len(d["user_id"])
        d["user_id"] = [1 if i % 2 == 0 else v for i, v in enumerate(d["user_id"])]
        return pa.table(d, schema=tab.schema)

    def skew_docs(tab):
        d = tab.to_pydict()
        d["source"] = ["hot-source" if i % 2 == 0 else v
                       for i, v in enumerate(d["source"])]
        return pa.table(d, schema=tab.schema)

    copy_all(src, f"{root}/skew", {"events": skew_events, "documents": skew_docs})

    # bigdoc: append one 10 MB document
    def bigdoc(tab):
        d = tab.to_pydict()
        rnd = random.Random(7)
        words = sorted({w for t in d["text"] for w in t.split(" ")})
        body = " ".join(rnd.choice(words) for _ in range(2_000_000))[:10_000_000]
        d["doc_id"].append(99999999)
        d["text"].append(body)
        d["lang"].append(d["lang"][0])
        d["source"].append(d["source"][0])
        d["n_chars"].append(len(body))
        return pa.table(d, schema=tab.schema)

    copy_all(src, f"{root}/bigdoc", {"documents": bigdoc})

    # flatvec: every embedding identical
    def flatvec(tab):
        d = tab.to_pydict()
        d["embedding"] = [d["embedding"][0] for _ in d["embedding"]]
        return pa.table(d, schema=tab.schema)

    copy_all(src, f"{root}/flatvec", {"embeddings": flatvec})

    # nullts: all event timestamps NULL
    def nullts(tab):
        d = tab.to_pydict()
        d["ts"] = [None] * len(d["ts"])
        return pa.table(d, schema=tab.schema)

    copy_all(src, f"{root}/nullts", {"events": nullts})

    # satvocab: documents x8, replicas token-shuffled (same 31-token
    # vocabulary -> saturated shingle space, dfs grow with n)
    def satvocab(tab):
        d = tab.to_pydict()
        n = len(d["doc_id"])
        out = {k: list(v) for k, v in d.items()}
        for r in range(1, 8):
            rnd = random.Random(1000 + r)
            for i in range(n):
                toks = d["text"][i].split(" ")
                rnd.shuffle(toks)
                text = " ".join(toks)
                out["doc_id"].append(d["doc_id"][i] + r * 100000)
                out["text"].append(text)
                out["lang"].append(d["lang"][i])
                out["source"].append(d["source"][i])
                out["n_chars"].append(len(text))
        return pa.table(out, schema=tab.schema)

    copy_all(src, f"{root}/satvocab", {"documents": satvocab})
    print(f"[hostile] wrote 7 variants under {root}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    root = sys.argv[2] if len(sys.argv) > 2 else "target/hostile"
    main(src, root)
