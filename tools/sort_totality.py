#!/usr/bin/env python3
"""Dev-only non-total-sort scanner (late r12; SURVEY §8 companion to
invariance.py).

Usage: python3 tools/sort_totality.py <verify_dump_dir>

For each query in <dump>/oracle_sql.json whose final ORDER BY parses to
simple output-column names (optionally positional), groups the dumped rows
by those sort keys and reports any group containing DISTINCT rows — the
signature of an under-specified sort whose emitted tie order depends on the
physical plan (and, under a LIMIT, of a nondeterministic row selection).
Queries whose ORDER BY does not parse are listed for hand-checking;
single-row outputs are exempt. Run against a FULL sf0.1 dump — the small
fixtures may lack the duplicate keys that expose ties. NOT part of the
shipped library.

This scan found five real defects in r12 (b03_join_skew_aqe via the 16-vs-7
audit, then b01_scan_project / b03_join_salted / b03_runtime_filter /
b03_subquery_corr via this generalization): all sorted by
(l_orderkey, l_linenumber), which the driver-generated lineitem fixture
duplicates with different suppkeys.
"""
import glob
import json
import os
import re
import sys

import pyarrow.parquet as pq


def final_order_by(sql):
    """The last ORDER BY at paren-depth 0 — the query's final sort.

    Window-function ORDER BYs live inside OVER(...) parens and inner
    CTE sorts inside their own parens, so depth-0 is exactly the final
    sort. Returns the clause text (without LIMIT/OFFSET) or None.
    """
    # one positional left-to-right pass blinds literals AND blanks
    # comments (r14, mirroring SortTotality.stripNoise): comments must
    # consume embedded quotes ("-- don't") and literals must consume
    # embedded comment starters ('--x') — two independent regex passes
    # get either order wrong for one of those
    out = list(sql)
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            for k in range(i + 1, min(j, n)):
                out[k] = " "
            i = j + 1
        elif c == '"':
            # double-quoted IDENTIFIER ("" escape aware): atomic span,
            # body blinded (r15 ADVICE, mirroring SortTotality): a '--',
            # '(' , ')' or ',' inside an identifier is name text, not
            # structure. Blinding loses the name, so such identifiers
            # route to the hand-check list below — fail-safe for a
            # dev tool; the Scala gate extracts names via a clean copy.
            j = i + 1
            while j < n:
                if sql[j] == '"':
                    if j + 1 < n and sql[j + 1] == '"':
                        j += 2
                        continue
                    break
                j += 1
            for k in range(i + 1, min(j, n)):
                out[k] = " "
            i = j + 1
        elif c == "-" and sql[i:i + 2] == "--":
            j = i
            while j < n and sql[j] != "\n":
                out[j] = " "
                j += 1
            i = j
        elif c == "/" and sql[i:i + 2] == "/*":
            depth_c, j = 1, i + 2
            out[i] = out[i + 1] = " "
            while j < n and depth_c > 0:
                if sql[j:j + 2] == "/*":
                    depth_c += 1; out[j] = out[j + 1] = " "; j += 2
                elif sql[j:j + 2] == "*/":
                    depth_c -= 1; out[j] = out[j + 1] = " "; j += 2
                else:
                    out[j] = " "; j += 1
            i = j
        else:
            i += 1
    s = "".join(out)
    depth, pos = 0, None
    i = 0
    while i < len(s):
        c = s[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and s[i:i + 8].upper() == "ORDER BY":
            pos = i + 8
        i += 1
    if pos is None:
        return None
    clause = s[pos:].strip()
    return re.sub(r"\s+LIMIT\s+\d+(\s+OFFSET\s+\d+)?\s*$", "",
                  clause, flags=re.I)


def split_top(clause):
    """Split a clause on top-level commas (commas inside parens stay)."""
    items, depth, cur = [], 0, []
    for c in clause:
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == "," and depth == 0:
            items.append("".join(cur)); cur = []
        else:
            cur.append(c)
    items.append("".join(cur))
    return items


def keys_of(sql, colnames):
    """Parse the final top-level ORDER BY into dump column names.

    Returns a list of column names, ('EXPR', item) when an item is an
    expression this parser cannot resolve (hand-check those — an
    unresolvable item always flags, never false-OKs), or None when the
    query has no final sort.
    """
    clause = final_order_by(sql)
    if clause is None:
        return None
    low = {c.lower(): c for c in colnames}
    cols = []
    for it in split_top(clause):
        it = re.sub(r"\s+(ASC|DESC)(\s+NULLS\s+(FIRST|LAST))?\s*$", "",
                    it.strip(), flags=re.I).strip()
        it = it.split(".")[-1].strip().strip('"')
        if re.fullmatch(r"\d+", it):
            idx = int(it) - 1
            if idx >= len(colnames):
                return ("EXPR", it)
            cols.append(colnames[idx])
        elif it.lower() in low:
            cols.append(low[it.lower()])
        else:
            return ("EXPR", it)
    return cols


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    n_ok = n_one = 0
    flagged, manual = [], []
    for name in sorted(oracle):
        files = sorted(glob.glob(os.path.join(out, name, "*.parquet")))
        if not files:
            manual.append((name, "no dump"))
            continue
        t = pq.read_table(files[0])
        if t.num_rows <= 1:
            n_one += 1
            continue
        k = keys_of(oracle[name], t.column_names)
        if k is None:
            manual.append((name, f"no ORDER BY, {t.num_rows} rows"))
            continue
        if isinstance(k, tuple):
            manual.append((name, f"unparsed ORDER BY item {k[1]!r}"))
            continue
        idx = [t.column_names.index(c) for c in k]
        rows = zip(*[t.column(c).to_pylist() for c in t.column_names])
        groups = {}
        for r in rows:
            groups.setdefault(tuple(r[i] for i in idx), set()).add(r)
        bad = [(kk, len(v)) for kk, v in groups.items() if len(v) > 1]
        if bad:
            flagged.append((name, k, len(bad), bad[0]))
        else:
            n_ok += 1
    print(f"total sort (or identical ties): {n_ok}; single-row: {n_one}")
    print(f"FLAGGED (distinct rows tie on sort keys): {len(flagged)}")
    for n, k, nb, ex in flagged:
        print(f"  {n}: keys={k} tie_groups={nb} "
              f"e.g. key={ex[0]} -> {ex[1]} distinct rows")
    print(f"HAND-CHECK (parser could not resolve): {len(manual)}")
    for n, why in manual:
        print(f"  {n} — {why}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
