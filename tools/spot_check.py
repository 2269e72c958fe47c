"""Spot-check named registry queries against their DuckDB oracles.

Usage: python tools/spot_check.py q1 [q2 ...] [--sf DIR ...]
Defaults to sf0.001 AND sf0.01 (the pre-commit validation pair).
Same three signals as tools/driver_check.py, restricted to the named
queries so a new operator can be verified in seconds.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.driver_check import TABLES, _norm_rows  # noqa: E402

from mathorcup_spark import registry  # noqa: E402
from mathorcup_spark.session import get_spark  # noqa: E402


def main() -> int:
    names: list[str] = []
    sfs: list[str] = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--sf":
            sfs.append(next(it))
        else:
            names.append(a)
    if not sfs:
        sfs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    qs = registry.queries()
    oracles = registry.oracles()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 1
    spark = get_spark()
    failures: list[str] = []
    for sf_dir in sfs:
        duck = duckdb.connect()
        for t in TABLES:
            duck.execute(
                f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in names:
            t0 = time.time()
            try:
                sdf = qs[name](spark, sf_dir)
                scols = sdf.columns
                srows = [tuple(r) for r in sdf.collect()]
            except Exception as exc:
                print(f"FAIL {name}@{sf_dir}: spark error {exc!r}")
                failures.append(f"{name}@{sf_dir}")
                continue
            if name not in oracles:
                print(f"ran  {name}@{sf_dir}: rows-only, {len(srows)} rows")
                if not srows:
                    failures.append(f"{name}@{sf_dir}")
                continue
            try:
                res = duck.execute(oracles[name])
                dcols = [d[0] for d in res.description]
                drows = res.fetchall()
            except Exception as exc:
                print(f"FAIL {name}@{sf_dir}: oracle error {exc!r}")
                failures.append(f"{name}@{sf_dir}")
                continue
            ok_cols = sorted(scols) == sorted(dcols)
            ok_rows = len(srows) == len(drows)
            ok_vals = (
                _norm_rows(scols, srows) == _norm_rows(dcols, drows)
                if (ok_cols and ok_rows)
                else None
            )
            status = "pass" if (ok_cols and ok_rows and ok_vals) else "FAIL"
            print(
                f"{status} {name}@{sf_dir}: rows {len(srows)}/{len(drows)}"
                f" cols={ok_cols} hash={ok_vals} ({time.time()-t0:.1f}s)"
            )
            if status == "FAIL":
                failures.append(f"{name}@{sf_dir}")
    print(f"\nfailures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
