"""PySpark-native rebuild of Gigablast's (exename/open-source-search-engine)
crawl frontier + fetch scheduler, plus the training-data-pipeline operators a
100 TB corpus needs (dedup, similarity search, text quality, multimodal
plumbing).

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, vectorized Arrow/pandas UDFs only where built-ins cannot express
the semantics (tabulation hashing, URL normalization, robots.txt grammar).
The reference's C++ behavior is cited per-function as ``file:line`` into
``/root/reference``; no reference code is copied.
"""

__version__ = "0.1.0"
