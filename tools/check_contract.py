"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, column names/order-insensitive values — flagging
any mismatch before the real driver does.

Usage: python tools/check_contract.py [--vanilla] [sf_dir] [query ...]

``--vanilla`` runs the Spark side under a bare SparkSession (no UTC /
ANSI / nanos confs) — simulating the real driver's environment; the
queries must self-configure.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from institutional_fx_etl_spark import get_spark  # noqa: E402
from institutional_fx_etl_spark.sources.schemas import TESTDATA_TABLES  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, row-sorted, dtype-normalized frame."""
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("float64") if s.isna().any() else s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    return df.sort_values(list(df.columns), ignore_index=True, na_position="last")


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return [
            f"column mismatch: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
        ]
    if len(spark_df) != len(duck_df):
        problems.append(f"row count: spark={len(spark_df)} duck={len(duck_df)}")
    a, b = canon(spark_df), canon(duck_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if np.issubdtype(av.dtype, np.floating):
                # BIT-PATTERN equality (plus NaN==NaN): the driver hash
                # is sensitive to the sign bit of -0.0, which `==`
                # treats as equal to +0.0 — the round-7 emb_covariance
                # hash-red slipped through the value compare this way
                af, bf = av.astype(np.float64), bv.astype(np.float64)
                eq = (af.view(np.uint64) == bf.view(np.uint64)) | (
                    np.isnan(af) & np.isnan(bf)
                )
                if not eq.all():
                    bad = int((~eq).sum())
                    diffs = np.abs(af[~eq] - bf[~eq])
                    problems.append(
                        f"col {c}: {bad} bit-pattern diffs, max abs diff"
                        f" {np.nanmax(diffs):.3e} (0.0 diffs are -0.0"
                        " sign-bit mismatches)"
                    )
            else:
                eq = (av == bv) | (pd.isna(a[c]).to_numpy() & pd.isna(b[c]).to_numpy())
                if not eq.all():
                    i = int(np.argmax(~eq))
                    problems.append(
                        f"col {c}: {int((~eq).sum())} value diffs, first at row {i}: "
                        f"{av[i]!r} vs {bv[i]!r}"
                    )
    return problems


#: Spark simpleString -> canonical Arrow-width name, the same family
#: DuckDB's .arrow() schema reports. Any oracle-paired query whose
#: Spark schema and DuckDB schema disagree under this canon is a
#: latent driver hash_match failure (round-7 lesson: DuckDB
#: SUM(int)->HUGEINT vs Spark BIGINT was value-equal but hash-red).
_SPARK_TO_ARROW = {
    "tinyint": "int8",
    "smallint": "int16",
    "int": "int32",
    "bigint": "int64",
    "float": "float",
    "double": "double",
    "string": "string",
    "boolean": "bool",
    "date": "date32[day]",
    "binary": "binary",
}


def _canon_spark_type(dt) -> str:
    s = dt.simpleString()
    if s.startswith("timestamp"):
        return "timestamp"
    if s.startswith(("decimal", "array", "map", "struct")):
        return s
    return _SPARK_TO_ARROW.get(s, s)


def _canon_arrow_type(a: str) -> str:
    if a.startswith("timestamp"):
        return "timestamp"
    if a == "large_string":
        return "string"
    return a


def type_mismatches(spark_df, duck_rel) -> dict[str, tuple[str, str]]:
    """Column -> (spark_type, duck_type) for every width disagreement.

    Spark side is analysis-only (no job runs); DuckDB side executes a
    LIMIT-0 wrapper — cheap at audit scale. An empty dict means the two
    engines will serialize identical Arrow widths, which is the
    invariant the driver's value hash depends on.
    """
    sschema = {
        f.name: _canon_spark_type(f.dataType) for f in spark_df.schema.fields
    }
    dschema = {
        f.name: _canon_arrow_type(str(f.type))
        for f in duck_rel.arrow().schema
    }
    return {
        c: (sschema.get(c), dschema.get(c))
        for c in set(sschema) | set(dschema)
        if sschema.get(c) != dschema.get(c)
    }


def main() -> int:
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    if vanilla:
        args.remove("--vanilla")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check_contract_vanilla")
            .getOrCreate()
        )
    else:
        spark = get_spark(app_name="check_contract")
    con = duck_connection(sf_dir)

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"~ {name}: rows-only ({len(sdf)} rows, no oracle)")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"✗ {name}: DUCKDB ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"✗ {name}: " + "; ".join(problems))
        else:
            print(f"✓ {name}: {len(sdf)} rows match")
    print(f"\n{'FAIL' if failures else 'OK'} ({failures} failures)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
