"""Fixed StructTypes for every table in the pipeline.

The reference is dynamic-schema-free: every record is a packed C struct
(``Spider.h:481-758`` SpiderRequest, ``Spider.h:772-910`` SpiderReply), so all
Spark schemas are fixed at module load — no inference anywhere.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# docs — interleaved text+media documents (BASELINE input_hint shape)
# ---------------------------------------------------------------------------

SPAN = T.StructType([
    T.StructField("kind", T.StringType(), False),       # 'text' | 'media_ref'
    T.StructField("text", T.StringType(), True),        # html/text fragment
    T.StructField("media_ref", T.StringType(), True),   # img/media URL
    T.StructField("offset", T.IntegerType(), False),    # strictly increasing
])

DOCS = T.StructType([
    T.StructField("doc_id", T.StringType(), False),     # normalized URL
    T.StructField("spans", T.ArrayType(SPAN), False),
])

# ---------------------------------------------------------------------------
# hosts — synthetic host/IP/robots dimension (reference 'firstip' tag
# semantics: all subdomains of a registered domain share one first_ip,
# Spider.h:142-152)
# ---------------------------------------------------------------------------

HOSTS = T.StructType([
    T.StructField("host", T.StringType(), False),
    T.StructField("first_ip", T.LongType(), False),
    T.StructField("robots_txt", T.StringType(), True),
    T.StructField("tags", T.ArrayType(T.StringType()), True),  # S8 tagdb
    # F19 dynamic robots: body the webserver serves after change_at
    # (picked up by the crawler at the next 24 h TTL refresh)
    T.StructField("robots_txt_after", T.StringType(), True),
    T.StructField("robots_change_at_s", T.LongType(), True),
])

SEEDS = T.StructType([
    T.StructField("url", T.StringType(), False),        # raw, pre-normalization
    T.StructField("added_time", T.LongType(), False),   # epoch seconds
])

# ---------------------------------------------------------------------------
# frontier — request/reply rows (Spiderdb re-expressed as a table).
# One table, two row kinds discriminated by is_request, exactly like the
# reference packs both in Spiderdb keyed (firstIp, uh48, isRequest)
# (Spider.h:399-406).
# ---------------------------------------------------------------------------

FRONTIER_REQUEST = T.StructType([
    T.StructField("first_ip", T.LongType(), False),
    T.StructField("uh48", T.LongType(), False),
    T.StructField("is_request", T.BooleanType(), False),   # True here
    T.StructField("url", T.StringType(), False),           # normalized
    T.StructField("host", T.StringType(), True),
    T.StructField("domain", T.StringType(), True),
    T.StructField("tld", T.StringType(), True),
    T.StructField("path_cgi", T.StringType(), True),       # path + '?' + query
    T.StructField("host_hash32", T.LongType(), True),
    T.StructField("dom_hash32", T.LongType(), True),
    T.StructField("site_hash32", T.LongType(), True),
    T.StructField("hop_count", T.IntegerType(), False),
    T.StructField("added_time", T.LongType(), False),      # epoch seconds
    T.StructField("discovery_time", T.LongType(), False),  # epoch seconds
    T.StructField("parent_uh48", T.LongType(), True),
    T.StructField("parent_domain", T.StringType(), True),  # feeds sniTable
    T.StructField("is_add_url", T.BooleanType(), False),
    T.StructField("is_injecting", T.BooleanType(), False),
    T.StructField("is_www", T.BooleanType(), False),
])

FRONTIER_REPLY = T.StructType([
    T.StructField("first_ip", T.LongType(), False),
    T.StructField("uh48", T.LongType(), False),
    T.StructField("is_request", T.BooleanType(), False),   # False here
    T.StructField("url", T.StringType(), False),
    T.StructField("spidered_time", T.LongType(), False),   # epoch seconds
    T.StructField("err_code", T.IntegerType(), False),     # 0 = ok
    T.StructField("err_count", T.IntegerType(), False),
    T.StructField("http_status", T.IntegerType(), False),
    T.StructField("content_hash32", T.LongType(), True),
    T.StructField("crawl_delay_ms", T.IntegerType(), False),   # -1 unset
    T.StructField("download_end_ms", T.LongType(), False),
    T.StructField("is_indexed", T.BooleanType(), False),
])

# host_state — the batch analogue of the in-memory side tables
# (m_cdTable SpiderColl.cpp:699-732, m_lastDownloadCache SpiderColl.cpp:748,
# waiting tree SpiderColl.cpp:4290-4305)
HOST_STATE = T.StructType([
    T.StructField("first_ip", T.LongType(), False),
    T.StructField("last_download_end_ms", T.LongType(), False),
    T.StructField("crawl_delay_ms", T.IntegerType(), False),   # -1 unset
    T.StructField("overflow", T.BooleanType(), False),
])

URL_FILTERS = T.StructType([
    T.StructField("rule_idx", T.IntegerType(), False),
    T.StructField("expression", T.StringType(), False),
    T.StructField("priority", T.IntegerType(), False),
    T.StructField("spider_freq_days", T.DoubleType(), False),
    T.StructField("max_spiders_per_rule", T.IntegerType(), False),
    T.StructField("spider_ip_wait_ms", T.IntegerType(), False),
    T.StructField("spider_ip_max_spiders", T.IntegerType(), False),
    T.StructField("force_delete", T.BooleanType(), False),
    T.StructField("harvest_links", T.BooleanType(), False),
])

# wave — one round's fetch schedule (Doledb + lock table analogue)
WAVE = T.StructType([
    T.StructField("round", T.IntegerType(), False),
    T.StructField("seq_in_round", T.IntegerType(), False),
    T.StructField("uh48", T.LongType(), False),
    T.StructField("url", T.StringType(), False),
    T.StructField("first_ip", T.LongType(), False),
    T.StructField("priority", T.IntegerType(), False),
    T.StructField("hop_count", T.IntegerType(), False),
    T.StructField("fetch_at_ms", T.LongType(), False),
])
