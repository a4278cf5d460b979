#!/usr/bin/env python3
"""Dev-only partition-invariance comparator (SURVEY §8 certification).

Usage: python3 tools/invariance.py <dumpA> <dumpB>

For each query directory present in both dumps, reads the (coalesced)
parquet result, tags each row with its position, and md5-hashes the
stringified rows IN ORDER — value-AND-order equality, the same bar the
round-6 audit used. Reports per-query MATCH/DIFF. NOT part of the
shipped library.
"""
import glob
import hashlib
import os
import sys

import pyarrow.parquet as pq


def digest(qdir):
    files = sorted(glob.glob(os.path.join(qdir, "*.parquet")))
    if not files:
        return None
    h = hashlib.md5()
    pos = 0
    for f in files:
        t = pq.read_table(f)
        cols = sorted(t.column_names)
        data = [t.column(c).to_pylist() for c in cols]
        for row in zip(*data):
            h.update(f"{pos}|{row!r}".encode())
            pos += 1
    return h.hexdigest(), pos


def main():
    a, b = sys.argv[1], sys.argv[2]
    names = sorted(
        set(os.listdir(a)) & set(os.listdir(b)) - {"oracle_sql.json"})
    bad = 0
    for n in names:
        da, db = digest(os.path.join(a, n)), digest(os.path.join(b, n))
        if da is None or db is None:
            print(f"MISS {n}: missing output ({da is None}/{db is None})")
            bad += 1
        elif da != db:
            print(f"DIFF {n}: {da} vs {db}")
            bad += 1
        else:
            print(f"MATCH {n} ({da[1]} rows)")
    print(f"== {len(names) - bad} match, {bad} differ, {len(names)} total")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
