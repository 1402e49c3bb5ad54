"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf=0.01, comparing row count, sorted column names, and the
order-insensitive multiset of values (stringified). Usage:

    python tools/check_oracle.py [name ...]          # default: all
    python tools/check_oracle.py --sample N --round R
        # rotating driver-style sample (r6 verdict task #5): the N
        # names whose sha256(f"r{R}:{name}") digests are smallest —
        # deterministic, seeded on the round number, disjoint-ish
        # across consecutive rounds so every op gets an independently
        # logged check within ~registry/N rounds.
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")


def norm_value(v):
    import datetime
    import decimal
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    return str(v)


def _decimal_columns(schema):
    """Names of top-level or nested columns whose type contains a
    DecimalType (driver pandas-stringify hazard)."""
    from pyspark.sql.types import (ArrayType, DecimalType, MapType,
                                   StructType)

    def has_dec(dt):
        if isinstance(dt, DecimalType):
            return True
        if isinstance(dt, ArrayType):
            return has_dec(dt.elementType)
        if isinstance(dt, MapType):
            return has_dec(dt.keyType) or has_dec(dt.valueType)
        if isinstance(dt, StructType):
            return any(has_dec(f.dataType) for f in dt.fields)
        return False

    return [f.name for f in schema.fields if has_dec(f.dataType)]


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm_value(r[i]) for i in order) for r in rows)


def main(names=None):
    import duckdb
    import __spark_entry__ as E
    from pmc_conversion_spark.session import get_spark

    spark = get_spark("oracle-check", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    qs = E.queries()
    oracles = E.oracle_sql()
    con = duckdb.connect()
    from pmc_conversion_spark.tables import TABLE_NAMES
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    selected = names or list(qs)
    if names and names[0] == "--sample":
        import hashlib
        n = int(names[1])
        rnd = int(names[names.index("--round") + 1]) \
            if "--round" in names else 0
        key = (lambda q:
               hashlib.sha256(f"r{rnd}:{q}".encode()).hexdigest())
        selected = sorted(sorted(qs), key=key)[:n]
        # r8 verdict Next-round #5: ops born since the previous-round
        # registry snapshot join the sample UNCONDITIONALLY, so every
        # new op gets one independent re-verification the round after
        # its birth round instead of waiting ~registry/N rounds for
        # the rotation to reach it.
        snap = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "registry_prev_round.txt")
        newborn = []
        if os.path.exists(snap):
            with open(snap) as fh:
                prev = {ln.strip() for ln in fh
                        if ln.strip() and not ln.startswith("#")}
            newborn = sorted(set(qs) - prev - set(selected))
            selected += newborn
        selected.sort()
        print(f"# rotating sample: {n} rotating + {len(newborn)} "
              f"born-since-snapshot of {len(qs)} registry names, "
              f"key=sha256('r{rnd}:'+name), round={rnd}, sf_dir={SF_DIR}")
    n_pass = n_fail = n_weak = 0
    failures = []
    for name in selected:
        if name not in qs:
            print(f"?? {name}: not registered")
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            t_engine = time.time() - t0
            # The DRIVER's gate goes through pandas: Spark Decimal
            # objects stringify as '1068285.00' while DuckDB's pandas
            # path yields float64 '1068285.0' — numerically equal,
            # hash-different (r3 verdict). This checker fetches both
            # sides natively so it cannot see that; flag the hazard
            # structurally instead: no query may OUTPUT a DecimalType.
            dec_cols = _decimal_columns(sdf.schema)
            if dec_cols:
                n_fail += 1
                failures.append(name)
                print(f"FAIL {name}: DecimalType output column(s) "
                      f"{dec_cols} — driver-hash hazard; cast the "
                      f"output boundary to double")
                continue
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name}: spark error")
            traceback.print_exc(limit=4)
            continue
        if name not in oracles:
            n_weak += 1
            print(f"weak {name}: rows-only ({len(srows)} rows) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        t1 = time.time()
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
            t_oracle = time.time() - t1
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc(limit=4)
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            sm, dm = rows_to_multiset(scols, srows), rows_to_multiset(dcols, drows)
            if sm != dm:
                diff_i = next(i for i, (a, b) in enumerate(zip(sm, dm)) if a != b) \
                    if len(sm) == len(dm) else 0
                problems.append(
                    f"values differ, e.g. spark={sm[diff_i]!r} duck={dm[diff_i]!r}")
        if problems:
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            n_pass += 1
            # engine-vs-oracle split (r7 verdict #5): heavy-gate
            # entries like graph_eigencentrality_power read as engine
            # cost when ~98% is DuckDB replaying an unrolled loop —
            # annotate the split so the log is self-explanatory.
            print(f"ok   {name} ({len(srows)} rows) "
                  f"[{time.time()-t0:.1f}s: engine {t_engine:.1f}s / "
                  f"oracle {t_oracle:.1f}s]")
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail "
          f"of {len(selected)}")
    if failures:
        print("failures:", " ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
