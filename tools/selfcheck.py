#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run Verify's parquet
dumps against DuckDB executing oracle_sql.json over the same testdata.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Emulates the strictest plausible compare: sort columns by name, sort rows
by all columns, require exact value equality (floats included — both
engines must produce bit-identical rounded values)."""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    def key(t):
        return tuple((v is None, str(type(v)), str(v)) for v in t)
    out.sort(key=key)
    return [c for c in sorted(cols)], out

def eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    produced = [d for d in os.listdir(out_dir)
                if os.path.isdir(os.path.join(out_dir, d))]
    # ADVICE r18 (medium): compare produced dirs against the FULL
    # expected list (every oracle key), not just what appeared on disk
    # — a query that crashed under Verify's pool must fail the gate
    # loudly, not vanish from it. Verify also writes failed.json with
    # queries that failed even after its serial retry.
    fj = os.path.join(out_dir, "failed.json")
    if os.path.exists(fj):
        with open(fj) as f:
            for name in json.load(f):
                print(f"FAIL {name}: Verify reported failure (failed.json)")
                n_fail += 1
    ej = os.path.join(out_dir, "expected.json")
    if os.path.exists(ej):
        with open(ej) as f:
            expected = set(json.load(f))
    else:  # older dumps: every oracle key is expected
        expected = set(oracles)
    for name in sorted(expected - set(produced)):
        print(f"FAIL {name}: expected but no output dir produced")
        n_fail += 1
    import time
    t_all = time.time()
    for name in sorted(produced):
        t_q = time.time()
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        try:
            sres = con.execute(
                f"SELECT * FROM '{spark_glob}'").fetchall()
            scols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(sres)} rows)")
            continue
        try:
            # type audit first: the driver's hasher is type-sensitive
            # (HUGEINT/DECIMAL -> pandas float/object, unsigned ints ->
            # pandas uint dtypes != Spark int64/double even when values
            # are equal), so ban those oracle column types.
            rel = con.sql(oracles[name])
            badty = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                     if str(t) in ("HUGEINT", "UHUGEINT", "UBIGINT",
                                   "UINTEGER", "USMALLINT", "UTINYINT")
                     or str(t).startswith("DECIMAL")]
            if badty:
                print(f"FAIL {name}: driver-hash-unsafe oracle types {badty}"
                      " (CAST to BIGINT/DOUBLE)")
                n_fail += 1
                continue
            # reuse the relation — don't execute the oracle SQL twice
            ocols = list(rel.columns)
            ores = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        sc, sr = canon(sres, scols)
        oc, orr = canon(ores, ocols)
        if sc != oc:
            print(f"FAIL {name}: columns {sc} != {oc}")
            n_fail += 1
            continue
        if len(sr) != len(orr):
            print(f"FAIL {name}: rowcount {len(sr)} != {len(orr)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(sr, orr)):
            if not all(eq(x, y) for x, y in zip(a, b)):
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}:\n  spark  {bad[1]}\n  oracle {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows, "
                  f"{int((time.time() - t_q) * 1000)} ms)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(produced)} produced, "
          f"{int(time.time() - t_all)} s")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
