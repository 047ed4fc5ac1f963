"""Local mirror of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its ``oracle_sql()`` twin on the
same parquet via DuckDB; compare row count, schema width, and an
order-insensitive value hash (columns sorted by name, rows sorted)."""

import math
import os

import duckdb
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        # FULL precision (shortest round-trip repr): repr equality on
        # doubles is bit equality, i.e. exactly the driver's value-hash
        # strictness.  The previous .6g canonicalization hid q7's
        # last-cent driver failure behind 6 significant digits
        # (VERDICT r4 item 2) — contract queries must be deterministic
        # to the bit, not to 6 sig figs.
        return repr(value)
    if isinstance(value, bool):
        return str(int(value))
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(_canon(v) for v in value) + "]"
    import datetime
    import decimal

    if isinstance(value, decimal.Decimal):
        return _canon(float(value))
    if isinstance(value, datetime.datetime):
        return value.isoformat(sep=" ")
    return str(value)


def _table(rows, cols):
    data = sorted(tuple(_canon(v) for v in row) for row in rows)
    return cols, data


def spark_result(df):
    cols = sorted(df.columns)
    rows = [[r[c] for c in cols] for r in df.collect()]
    return _table(rows, cols)


def duck_result(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [[row[i] for i in order] for row in cur.fetchall()]
    return _table(rows, sorted(cols))


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def all_query_names():
    import __spark_entry__ as entry

    return sorted(entry.queries().keys())


@pytest.mark.parametrize("name", all_query_names())
def test_query_matches_oracle(spark, sf_dir, duck, name):
    import __spark_entry__ as entry

    q = entry.queries()[name]
    oracles = entry.oracle_sql()
    df = q(spark, sf_dir)
    got_cols, got_rows = spark_result(df)
    assert len(got_rows) >= 0  # ran
    if name not in oracles:
        pytest.skip(f"{name}: no oracle (rows-only check), rows={len(got_rows)}")
    exp_cols, exp_rows = duck_result(duck, oracles[name])
    assert got_cols == exp_cols, f"schema mismatch: {got_cols} vs {exp_cols}"
    assert len(got_rows) == len(exp_rows), (
        f"row count {len(got_rows)} vs {len(exp_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(got_rows, exp_rows) if a != b
    ][:5]
    assert not mismatches, f"value mismatch (first 5): {mismatches}"


def test_canon_full_precision():
    """The mirror must see a perturbation in the 8th significant digit —
    the exact class of diff (last cent of a 7-digit revenue) that the .6g
    canonicalization hid while the driver's exact hash failed (q7, r4)."""
    v = 774619.34
    assert _canon(v) != _canon(v + 0.01)
    assert _canon(v) != _canon(v + 1e-9)  # even sub-cent FP drift is visible
    assert _canon(v) == _canon(774619.34)
    assert _canon(float("nan")) == "nan"


def test_entry_smoke(spark):
    import __spark_entry__ as entry

    df = entry.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
