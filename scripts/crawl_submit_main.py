"""spark-submit entry point (absolute imports — the package itself arrives
via --py-files)."""

import sys

from open_source_search_engine_spark.plans.crawl_loop import main

if __name__ == "__main__":
    sys.exit(main())
