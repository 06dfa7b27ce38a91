"""Run the driver-style oracle sweep at an arbitrary scale factor.

Usage: python scripts/check_parity.py [sf_dir] [query_name ...]
       python scripts/check_parity.py [sf_dir] --window

With query names given, only those registry entries are checked
(substring match allowed) — the fast loop while iterating on one op.
``--window`` is the driver dress rehearsal: check exactly the FIRST
50 entries of ``queries()`` — the set the round driver will verify —
so a round never ships a window with a latent red row.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from game_data_etl_pipeline_spark import registry
from game_data_etl_pipeline_spark.session import get_spark
from tests.conftest import make_duck
from tests.oracle import compare


def main() -> int:
    args = sys.argv[1:]
    # sf_dir is positional-first but optional; a leading flag (e.g.
    # ``--window`` with no sf_dir) must not be mistaken for a path
    if args and not args[0].startswith("--"):
        sf_dir, only = args[0], args[1:]
    else:
        sf_dir, only = "/root/testdata/sf0.01", args
    window: set[str] | None = None
    if "--window" in only:
        only = [a for a in only if a != "--window"]
        window = set(list(registry.all_specs())[:50])
        print(f"driver-window rehearsal: {len(window)} queries")
    spark = get_spark("parity")
    duck = make_duck(sf_dir)
    failures = 0
    for name, spec in sorted(registry.all_specs().items()):
        if window is not None and name not in window:
            continue
        if only and not any(pat in name for pat in only):
            continue
        try:
            if spec.oracle is None:
                n = spec.fn(spark, sf_dir).count()
                print(f"OK   {name} (rows-only, {n} rows)")
                continue
            problems = compare(spec.fn(spark, sf_dir), duck.execute(spec.oracle).df(), name)
        except Exception as e:  # noqa: BLE001
            problems = [f"{name}: EXCEPTION {type(e).__name__}: {str(e).splitlines()[0][:200]}"]
        if problems:
            failures += 1
            print(f"FAIL {name}")
            for p in problems:
                print(f"     {p[:300]}")
        else:
            print(f"OK   {name}")
    print(f"\nfailures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
