"""Order-insensitive result comparison against a DuckDB oracle.

Mirrors the driver's correctness gate: row count + column-name set +
value multiset, with floats canonicalized to 6 significant digits.
Used by tools/selfcheck.py and the pytest oracle-parity suite.
"""

from __future__ import annotations

import math


def canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        return float(f"{v:.6g}")
    if isinstance(v, int):
        return v
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def compare(s_cols, s_rows, o_cols, o_rows) -> list[str]:
    """Return a list of problems; empty list means match."""
    problems: list[str] = []
    if len(s_rows) != len(o_rows):
        problems.append(f"rowcount spark={len(s_rows)} duck={len(o_rows)}")
    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in o_cols):
        problems.append(f"columns spark={sorted(s_cols)} duck={sorted(o_cols)}")
    if problems:
        return problems
    _, s_canon = canon_rows(s_cols, s_rows)
    _, o_canon = canon_rows(o_cols, o_rows)
    if s_canon != o_canon:
        n_bad = sum(1 for a, b in zip(s_canon, o_canon) if a != b)
        problems.append(f"values: {n_bad}/{len(s_canon)} rows differ")
        for a, b in zip(s_canon, o_canon):
            if a != b:
                problems.append(f"  first diff: spark={a} duck={b}")
                break
    return problems


def duckdb_with_views(sf_dir: str):
    import duckdb

    from .tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con
