"""Replay the driver's correctness gate locally: run every
__spark_entry__ query on Spark AND its oracle on DuckDB, compare
row-count + schema-ish + order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-ish normalization: repr of rounded double
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


# -- driver-style type-coercion audit -------------------------------------
# The driver fetches the DuckDB oracle via Arrow/pandas, where HUGEINT
# (DuckDB's SUM-over-BIGINT result) coerces to float64 and renders
# "99111.0" while Spark's long renders "99111" — a value-hash mismatch
# even when the values are identical (the r7 json_props red row).  A
# plain fetchall() masks this (Python ints), so we audit the DECLARED
# output types: Spark schema kind vs the pandas-coercion kind of the
# DuckDB `DESCRIBE` type.  Kinds: 'i' int-rendered, 'f' float-rendered,
# None = not numeric / not comparable this way (skip).

_DUCK_INT_PREFIXES = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                      "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT")
_DUCK_FLOAT_PREFIXES = ("HUGEINT", "UHUGEINT", "DOUBLE", "FLOAT", "REAL",
                        "DECIMAL")


def duck_kind(t: str):
    t = t.upper()
    if t.endswith("[]") or t.startswith(("STRUCT", "MAP", "LIST")):
        return None
    if t.startswith(_DUCK_INT_PREFIXES):
        return "i"
    if t.startswith(_DUCK_FLOAT_PREFIXES):
        return "f"
    return None


def spark_kind(dt: str):
    # df.dtypes yields Spark simpleStrings: tinyint/smallint/int/bigint
    if dt in ("tinyint", "smallint", "int", "bigint"):
        return "i"
    if dt in ("float", "double"):
        return "f"
    return None


def kind_mismatches(con, sdf, sql):
    """Columns whose driver-side (pandas) rendering would differ in
    int-ness between the Spark result and the DuckDB oracle."""
    duck = {name: typ for name, typ, *_ in
            con.execute("DESCRIBE " + sql).fetchall()}
    out = []
    for name, dt in sdf.dtypes:
        ks, ko = spark_kind(dt), duck_kind(duck.get(name, ""))
        if ks and ko and ks != ko:
            out.append((name, dt, duck.get(name)))
    return out


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "entry", Path(__file__).resolve().parent.parent / "__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from conduino_spark.session import get_spark
    spark = get_spark("oracle_check", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, osql = m.queries(), m.oracle_sql()
    # bench-extra pins that carry an oracle (e.g. profile_media) are
    # replayable too — appended after the 50 declared gate queries
    for name, q in m.bench_extras().items():
        if name in osql and name not in qs:
            qs[name] = q
    n_pass = n_fail = 0
    for name, q in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        if name not in osql:
            print(f"SKIP {name}: no oracle (rows-only): {len(srows)} rows "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(osql[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        ok_count = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        sh, oh = value_hash(scols, srows), value_hash(ocols, orows)
        ok_hash = sh == oh
        try:
            km = kind_mismatches(con, sdf, osql[name])
        except Exception:
            km = []
        status = ("PASS" if (ok_count and ok_cols and ok_hash and not km)
                  else "FAIL")
        detail = ""
        if km:
            detail += (f" driver-style type coercion (spark vs duckdb):"
                       f" {km};")
        if not ok_count:
            detail += f" rows {len(srows)} vs {len(orows)};"
        if not ok_cols:
            detail += f" cols {sorted(scols)} vs {sorted(ocols)};"
        if ok_count and ok_cols and not ok_hash:
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            sset = sorted("|".join(norm_cell(r[i]) for i in order) for r in srows)
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
            oset = sorted("|".join(norm_cell(r[i]) for i in oorder) for r in orows)
            diffs = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
            detail = f" hash {sh} vs {oh}; first diffs: {diffs}"
        print(f"{status} {name}: {len(srows)} rows [{time.time()-t0:.1f}s]{detail}")
        n_pass += status == "PASS"
        n_fail += status == "FAIL"
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
