#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle and diff per query.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_tables(con, sf_dir):
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    # Derived corpora (graft.ScaleUp) store events.ts as BIGINT NANOS —
    # the same value Spark reads from the driver's TIMESTAMP(NANOS)
    # parquet. Re-surface it as a timestamp so every oracle query works
    # identically on both corpora.
    try:
        (ts_type,) = con.execute(
            "SELECT typeof(ts) FROM events LIMIT 1").fetchone()
        if ts_type == "BIGINT":
            # make_timestamp(BIGINT) takes epoch MICROS; the data is
            # micro-precision so nanos // 1000 is lossless. (The nanos
            # variant make_timestamp_ns doesn't exist in this DuckDB —
            # and this block must not silently fall through: BIGINT ts
            # reaching the oracles breaks ~30 event-time queries.)
            con.execute("CREATE OR REPLACE VIEW events AS SELECT "
                        "* REPLACE (make_timestamp(ts // 1000) AS ts) "
                        f"FROM read_parquet('{os.path.join(sf_dir, 'events.parquet')}')")
    except Exception:
        pass  # no events table in this corpus

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def compare(name, spark_df, duck_df):
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            # The driver hashes STRINGIFIED values, so this must compare
            # stringified values — never numerically. int64 "2" vs float64
            # "2.0", and object-Decimal "677248" vs float64 "677248.0",
            # hash-mismatch even when numerically equal (DuckDB's fetchdf
            # widens HUGEINT and precision-38 DECIMAL to float64; Spark
            # parquet reads them back as int64 / decimal.Decimal). A prior
            # numeric-comparison branch here masked exactly that drift for
            # three rounds (q250).
            avs, bvs = av.astype(str), bv.astype(str)
            neq = avs != bvs
            if neq.any():
                i = neq.idxmax()
                if av.dtype.kind != bv.dtype.kind:
                    return (f"DTYPE col={c} spark={av.dtype} duck={bv.dtype} "
                            f"row={i} spark={av[i]!r} duck={bv[i]!r} "
                            f"(driver stringifies: {avs[i]} vs {bvs[i]})")
                return f"VAL col={c} row={i} spark={av[i]!r} duck={bv[i]!r}"
        except Exception as e:
            return f"CMPERR col={c}: {e}"
    return None

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    # Guardrails for the big derived corpora (sf1 scale-up): without a
    # memory limit a pathological oracle plan grows until the kernel
    # OOM-kills the whole checker (seen at 130 GB on an unmaterialized
    # graph-CTE inline at sf1); with one, DuckDB spills to disk instead.
    mem_limit = os.environ.get("GRAFT_DUCKDB_MEMORY", "48GB")
    spill_dir = os.environ.get("GRAFT_DUCKDB_SPILL", "/tmp/duckdb_check_spill")
    threads = os.environ.get("GRAFT_DUCKDB_THREADS")

    def fresh_con():
        c = duckdb.connect()
        try:
            c.execute(f"SET memory_limit='{mem_limit}'")
            c.execute(f"SET temp_directory='{spill_dir}'")
            # A thread cap (e.g. 8) keeps a long sweep from exhausting the
            # process thread limit — DuckDB defaults to one thread per CPU
            # and a 400-oracle run has died on pthread_create EAGAIN.
            if threads:
                c.execute(f"SET threads={int(threads)}")
        except Exception as e:
            print(f"WARN: duckdb memory_limit/temp_directory not applied "
                  f"({e}); checker may use unbounded memory", file=sys.stderr)
        load_tables(c, sf_dir)
        return c

    con = fresh_con()
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    fails = []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"MISSING {name} (no spark output)"); n_fail += 1; fails.append(name); continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        except Exception as e:
            print(f"READERR {name}: {e}"); n_fail += 1; fails.append(name); continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            msg = str(e).splitlines()[0]
            print(f"ORACLE-ERR {name}: {msg}"); n_fail += 1; fails.append(name)
            # one OOM'd query poisons the connection (buffers from the
            # failed plan stay accounted against the memory limit, so
            # every later query dies on kilobyte allocations) — but ONLY
            # memory-class failures need the expensive rebuild (fresh_con
            # re-runs load_tables; paying a full sf1 reload per cheap
            # binder error turns a fast-fail sweep into hours). For other
            # errors, a liveness probe decides.
            needs_rebuild = any(t in msg.lower() for t in (
                "memory", "allocat", "out of", "database has been invalidated"))
            if not needs_rebuild:
                try:
                    con.execute("SELECT 1").fetchone()
                except Exception:
                    needs_rebuild = True
            if needs_rebuild:
                try:
                    con.close()
                except Exception:
                    pass
                con = fresh_con()
            continue
        err = compare(name, spark_df, duck_df)
        if err:
            print(f"FAIL {name}: {err}"); n_fail += 1; fails.append(name)
        else:
            print(f"PASS {name} ({len(spark_df)} rows)"); n_pass += 1
    # rows-only queries: just report row counts
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(d)
        if os.path.isdir(d) and name not in oracle and not (only and name not in only):
            files = glob.glob(os.path.join(d, "*.parquet"))
            if files:
                n = sum(len(pd.read_parquet(f)) for f in files)
                print(f"ROWS-ONLY {name}: {n} rows")
    print(f"\n{n_pass} passed, {n_fail} failed" + (f": {' '.join(fails)}" if fails else ""))
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
