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
  skewlang - one documents.lang (and one source) holds 80% of docs:
             the dominant-stratum regime for the keyed histogram ranks
  dst      - events.ts remapped into four 4-day windows straddling a
             year boundary (2023-12-31), a leap day (2024-02-29), the
             US spring-forward (2024-03-10) and fall-back (2024-11-03):
             UTC epoch-day bucketing must stay calendar-correct through
             all four edges (the calendar-grain class: daily series,
             business days, seasonal slots)

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

    # skewlang: one language holds 80% of documents (and one source the
    # same 80%) - the dominant-stratum regime the r19 keyed histogram
    # ranks (percentileRankPpm/groupEcdf/quantileNormalize) are built
    # for; the retired per-key sort windows put this whole slice
    # through one reducer
    def skewlang(tab):
        d = tab.to_pydict()
        d["lang"] = ["en" if i % 10 < 8 else v for i, v in enumerate(d["lang"])]
        d["source"] = ["src0" if i % 10 < 8 else v
                       for i, v in enumerate(d["source"])]
        return pa.table(d, schema=tab.schema)

    copy_all(src, f"{root}/skewlang", {"documents": skewlang})

    # dst: round-robin events across four 4-day windows, each straddling
    # one calendar edge; the event keeps its deterministic in-window
    # offset (orig epoch-us mod 4 days), so ordering inside a window is
    # a pure function of the source row. Timestamps stay naive (the
    # driver's physical flavor) - epoch math avoids local-TZ .timestamp()
    def dstts(tab):
        import datetime as dt

        epoch = dt.datetime(1970, 1, 1)
        window_us = 4 * 86400 * 1_000_000

        def edge(y, m, d, h=0):
            return int((dt.datetime(y, m, d, h) - epoch).total_seconds())

        anchors = [  # window starts: edge lands mid-window
            edge(2023, 12, 30),       # year boundary 2023-12-31 -> 01-01
            edge(2024, 2, 27),        # leap day 2024-02-29
            edge(2024, 3, 8, 12),     # US spring-forward 2024-03-10
            edge(2024, 11, 1, 12),    # US fall-back 2024-11-03
        ]
        d = tab.to_pydict()
        out = []
        for i, t in enumerate(d["ts"]):
            if t is None:
                out.append(None)
                continue
            # exact integer microseconds: timedelta floordiv — NOT
            # total_seconds(), whose float granularity (~0.4 us at 2024
            # epochs) can perturb the documented pure-integer offset
            orig_us = (t - epoch) // dt.timedelta(microseconds=1)
            off = orig_us % window_us
            new_us = anchors[i % 4] * 1_000_000 + off
            out.append(epoch + dt.timedelta(microseconds=new_us))
        d["ts"] = out
        return pa.table(d, schema=tab.schema)

    copy_all(src, f"{root}/dst", {"events": dstts})
    print(f"[hostile] wrote 9 variants under {root}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    root = sys.argv[2] if len(sys.argv) > 2 else "target/hostile"
    main(src, root)
