"""CLI: dump the formatted physical plan of any catalog query.

    python -m open_source_search_engine_spark.plans.explain f11_winner_window

Used to verify the plans stay the ones we want at scale: filters pushed to
the parquet scan (PushedFilters/ReadSchema), broadcasts on the small sides,
no redundant exchanges.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query", nargs="*", help="catalog keys (default: all)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--cpus", type=int, default=4)
    args = ap.parse_args(argv)

    from ..queries import QUERIES
    from ..session import get_spark

    spark = get_spark(app="explain", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    keys = args.query or sorted(QUERIES)
    for k in keys:
        if k not in QUERIES:
            print(f"unknown query: {k}", file=sys.stderr)
            return 1
        print(f"===== {k} =====")
        QUERIES[k](spark, args.sf_dir).explain("formatted")
    return 0


if __name__ == "__main__":
    sys.exit(main())
