"""Arrow-batched UDF wrappers around the deterministic kernels.

North-rule constraint: NO per-row Python UDFs — everything here is a
``pandas_udf`` / ``mapInPandas`` (Arrow batch transfer); the uh48 hash is
fully NumPy-vectorized inside the batch (``functions/ghash.py``), the string
state machines (normalize / robots / outlink regex) run per-element inside
the Arrow batch, which is the reference's own per-record cost re-hosted in a
columnar transport.  Everything downstream of these columns is pure
DataFrame/Window/join (JVM, whole-stage codegen).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..corpus import _domain_ip
from ..functions.charset import decode_batch
from ..functions.ghash import hash32_bytes, uh48_bytes
from ..functions.outlinks import extract_outlinks
from ..functions.robots import crawl_delay_batch, robots_allowed_batch
from ..functions.urlnorm import domain_of_host, normalize_url


@F.pandas_udf(T.LongType())
def uh48_udf(urls: pd.Series) -> pd.Series:
    """uh48 = hash64b(url) & 0xffffFFFFffff (Spider.h:729-738) — tabulation
    table XOR fully vectorized over the Arrow batch."""
    return pd.Series(uh48_bytes(urls.fillna("").str.encode("utf-8")))


@F.pandas_udf(T.LongType())
def hash32_udf(strs: pd.Series) -> pd.Series:
    return pd.Series(hash32_bytes(strs.fillna("").str.encode("utf-8")))


@F.pandas_udf(T.StringType())
def domain_of_host_udf(hosts: pd.Series) -> pd.Series:
    """Registered domain of a hostname (Url.cpp getDomain split) — used to
    map the tagdb hosts dimension to per-domain authority status."""
    return hosts.fillna("").map(domain_of_host)


@F.pandas_udf(T.LongType())
def domain_ip_udf(domains: pd.Series) -> pd.Series:
    """Deterministic firstIp fallback for hosts missing from the dim table
    (reference resolves via tagdb 'firstip' else DNS, Msge1.cpp:132-252; our
    synthetic map hashes the registered domain)."""
    return domains.fillna("").map(_domain_ip).astype("int64")


# struct returned by URL normalization (one pandas_udf → 8 columns via
# getField, single Arrow round trip)
NORM_STRUCT = T.StructType([
    T.StructField("url_norm", T.StringType()),
    T.StructField("host", T.StringType()),
    T.StructField("domain", T.StringType()),
    T.StructField("tld", T.StringType()),
    T.StructField("path_cgi", T.StringType()),
    T.StructField("is_www", T.BooleanType()),
])


def make_normalize_udf(strip_params: bool = True,
                       strip_common_file: bool = True):
    @F.pandas_udf(NORM_STRUCT)
    def normalize_struct_udf(urls: pd.Series) -> pd.DataFrame:
        rows = []
        for raw in urls:
            p = normalize_url(raw, strip_params=strip_params,
                              strip_common_file=strip_common_file)
            if p is None:
                rows.append((None, None, None, None, None, None))
            else:
                rows.append((p.url, p.host, p.domain, p.tld,
                             p.path_with_cgi, p.host.startswith("www.")))
        return pd.DataFrame(rows, columns=[f.name for f in NORM_STRUCT.fields])

    return normalize_struct_udf


def make_robots_udfs(user_agent: str):
    """(allowed_udf, delay_udf) — robots compile+match (F17/F18).  Compiled
    robots are cached per distinct body inside each batch, so a million URLs
    of one host compile once per partition."""

    @F.pandas_udf(T.BooleanType())
    def robots_allowed_udf(robots_txt: pd.Series, path_cgi: pd.Series) -> pd.Series:
        return pd.Series(
            robots_allowed_batch(robots_txt.fillna("").tolist(),
                                 path_cgi.fillna("/").tolist(), user_agent))

    @F.pandas_udf(T.IntegerType())
    def robots_delay_udf(robots_txt: pd.Series) -> pd.Series:
        return pd.Series(
            crawl_delay_batch(robots_txt.fillna("").tolist(), user_agent),
            dtype="int32")

    return robots_allowed_udf, robots_delay_udf


# outlink rows produced by the fetch/parse stage (F22-F24) before the
# hosts-dim join fills first_ip
OUTLINK_STRUCT = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("host", T.StringType()),
    T.StructField("domain", T.StringType()),
    T.StructField("tld", T.StringType()),
    T.StructField("path_cgi", T.StringType()),
    T.StructField("is_www", T.BooleanType()),
    T.StructField("uh48", T.LongType()),
    T.StructField("hop_count", T.IntegerType()),
    T.StructField("added_time", T.LongType()),
    T.StructField("discovery_time", T.LongType()),
    T.StructField("parent_uh48", T.LongType()),
    T.StructField("parent_domain", T.StringType()),
])


def outlinks_map_in_pandas(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (url, spans, hop_count, spidered_time, uh48) →
    outlink request rows.  Span order is preserved by extract_outlinks;
    per-page first-occurrence dedup per XmlDoc.cpp:15179-15272; media refs
    dropped from the frontier (XmlDoc.cpp:15293-15303); site roots reset to
    hop 0 (XmlDoc.cpp:15371-15385)."""
    cols = [f.name for f in OUTLINK_STRUCT.fields]
    for batch in iterator:
        rows: list[tuple] = []
        for url, spans, hop, sp_s, parent in zip(
                batch["url"], batch["spans"], batch["hop_count"],
                batch["spidered_time"], batch["uh48"]):
            for link in extract_outlinks(url, list(spans)):
                if link["is_media"]:
                    continue
                child_hop = 0 if link["path_cgi"] == "/" else min(int(hop) + 1, 65535)
                rows.append((link["url_norm"], link["host"], link["domain"],
                             link["tld"], link["path_cgi"], link["is_www"],
                             0, child_hop, int(sp_s), int(sp_s), int(parent),
                             link["parent_domain"]))
        df = pd.DataFrame(rows, columns=cols)
        if len(df):
            df["uh48"] = uh48_bytes(df["url"].str.encode("utf-8"))
        yield df


# decoded-page struct for the charset stage (getCharset/Unicode.cpp: every
# fetched body converts to unicode text before link harvest and indexing)
CHARSET_STRUCT = T.StructType([
    T.StructField("text", T.StringType()),
    T.StructField("charset", T.StringType()),
    T.StructField("charset_source", T.StringType()),
])


def charset_decode_map_in_pandas(iterator: Iterator[pd.DataFrame]
                                 ) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (raw binary, content_type) → (text, charset,
    charset_source).  Pass-through columns ride alongside: the input batch
    is yielded back with the three decoded columns appended."""
    for batch in iterator:
        cols = decode_batch(
            [bytes(b) if b is not None else b"" for b in batch["raw"]],
            list(batch.get("content_type",
                           pd.Series([None] * len(batch)))))
        out = batch.drop(columns=["raw", "content_type"], errors="ignore")
        for k, v in cols.items():
            out[k] = pd.Series(v, dtype="object")
        yield out
