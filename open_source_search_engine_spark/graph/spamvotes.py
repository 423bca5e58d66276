"""Link-spam votes as a Spark operator — Linkdb's ``m_isLinkSpam`` bit.

The reference computes ``isLinkSpam`` once per (linker page, linkee) at
link-info time and stores the verdict in the linkdb key
(``Linkdb.cpp:289`` ``k.n2 |= 0x01``); Msg25 then skips spam keys when
building LinkInfo (``Linkdb.cpp:1388-1452`` — ``m_doLinkSpamCheck``).

Spark shape: one ``mapInPandas`` pass over the linker pages (Arrow
batches; the per-doc kernel is :func:`functions.linkspam.link_spam_votes`,
shared with the pytest oracle) emits the vote table
``(doc_id, linker_url, url_norm, linkee_host, is_spam, note)``.  The
vote table is a one-time byproduct of the parse stage — at 10^10 links it
is written bucketed by linkee host alongside the link graph, so
``good_inlink_counts`` (the Msg25 LinkInfo aggregate) is a bucket-local
groupBy with no extra exchange.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.linkspam import link_spam_votes

VOTE_STRUCT = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("linker_url", T.StringType()),
    T.StructField("url_norm", T.StringType()),
    T.StructField("linkee_host", T.StringType()),
    T.StructField("is_spam", T.BooleanType()),
    T.StructField("note", T.StringType()),
])


def _votes_map_in_pandas(iterator: Iterator[pd.DataFrame]
                         ) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in VOTE_STRUCT.fields]
    for batch in iterator:
        sni = (batch["site_num_inlinks"]
               if "site_num_inlinks" in batch.columns
               else pd.Series([0] * len(batch)))
        rows: list[tuple] = []
        for doc_id, url, spans, n_inl in zip(
                batch["doc_id"], batch["url"], batch["spans"], sni):
            for v in link_spam_votes(url, list(spans),
                                     site_num_inlinks=int(n_inl)):
                rows.append((int(doc_id), url, v["url_norm"],
                             v["linkee_host"], bool(v["is_spam"]),
                             v["note"]))
        yield pd.DataFrame(rows, columns=cols)


def link_spam_votes_df(docs: DataFrame) -> DataFrame:
    """``docs(doc_id, url, spans[, site_num_inlinks])`` → vote rows.

    One Arrow pass, no shuffle; the kernel is pure so the operator is
    deterministic and partition-invariant."""
    cols = [c for c in ("doc_id", "url", "spans", "site_num_inlinks")
            if c in docs.columns]
    return docs.select(*cols).mapInPandas(_votes_map_in_pandas,
                                          schema=VOTE_STRUCT)


def good_inlink_counts(votes: DataFrame) -> DataFrame:
    """Msg25 LinkInfo aggregation with the spam bit honored
    (Linkdb.cpp:1450 ``m_linkSpamOut``): per linkee host, distinct
    linker hosts split into good and spam votes.  ``n_good_inlinks`` is
    the reference's ``m_numGoodInlinks`` analogue."""
    linker_host = F.regexp_extract("linker_url", r"^[a-z]+://([^/:?]+)", 1)
    return (votes
            .withColumn("linker_host", linker_host)
            .groupBy("linkee_host")
            .agg(F.count_distinct(
                     F.when(~F.col("is_spam"), F.col("linker_host")))
                 .alias("n_good_inlinks"),
                 F.count_distinct(
                     F.when(F.col("is_spam"), F.col("linker_host")))
                 .alias("n_spam_inlinks")))
