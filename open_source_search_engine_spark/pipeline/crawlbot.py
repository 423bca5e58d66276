"""The crawlbot admin surface: CrawlInfo counters, the spider-status
ladder, the /crawlbot JSON/XML envelopes, and the daily-merge trigger.

- ``PageCrawlBot.cpp:36-112`` ``printCrawlDetails2`` — the status
  envelope (statusCode/statusMsg/jobCreationTimeUTC/jobCompletionTimeUTC/
  urlsHarvested/pageCrawlAttempts/pageCrawlSuccesses/currentTime), with
  the completed-time zeroing rule for still-running jobs.
- ``Collectiondb.h:180-217`` ``CrawlInfo`` — the counter block the
  envelope reads; here one aggregate pass over the crawl's committed
  request/reply logs (the batch unit that replaces the reference's
  every-20-s crawlinfo gather, SpiderLoop.cpp:2041-2360).
- ``Spider.cpp:4026-4141`` ``getSpiderStatusMsg`` — the status ladder,
  rung for rung (admin kill switches before the per-collection pause,
  before initializing/round-done/no-urls, INPROGRESS last).
- ``Spider.h:65-75`` — the SP_* codes.
- ``DailyMerge.cpp:108-182`` — the trigger-window gate (minutes into
  the UTC day within [trigger, trigger+15], >=24 h since the last
  merge, day-of-week list), including the reference's off-by-one
  ``todayDOW = tm_wday + 1`` quirk: Saturday can NEVER trigger and the
  DOW list is shifted by one (a "1" fires on Sunday).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import functions as F

# Spider.h:65-75
SP_INITIALIZING = 0
SP_ROUNDDONE = 4
SP_NOURLS = 5
SP_PAUSED = 6
SP_INPROGRESS = 7
SP_ADMIN_PAUSED = 8
SP_COMPLETED = 9


@dataclass
class CrawlInfo:
    """Collectiondb.h:180-217 (the fields the crawlbot envelope prints)."""
    urls_harvested: int = 0
    page_download_attempts: int = 0
    page_download_successes: int = 0
    objects_added: int = 0
    has_urls_ready_to_spider: bool = False


def gather_crawl_info(runner) -> CrawlInfo:
    """One aggregate pass over the committed logs — the batch analogue
    of the reference's global crawlinfo gather: urlsHarvested = spider
    requests added (SpiderColl addSpiderRequest tally), attempts /
    successes = the reply log (Msg13 download outcomes), objectsAdded =
    pages actually indexed (titledb adds)."""
    req = runner.url_seen()
    rep = runner.replies_log()
    harvested = req.count()
    row = rep.agg(
        F.count("*").alias("att"),
        F.coalesce(F.sum(F.when(F.col("err_code") == 0, 1)), F.lit(0))
        .alias("succ")).collect()[0]
    indexed = runner.indexed_docs().count()
    from . import snapshots as snap
    m = snap.load_manifest(runner.state_dir)
    # batch analogue of m_hasUrlsReadyToSpider: the crawl has committed
    # state and its frontier is not exhausted
    ready = bool(m is not None and not m.finished)
    return CrawlInfo(urls_harvested=int(harvested),
                     page_download_attempts=int(row["att"]),
                     page_download_successes=int(row["succ"]),
                     objects_added=int(indexed),
                     has_urls_ready_to_spider=ready)


def spider_status(*, spidering_enabled_master: bool = True,
                  read_only: bool = False,
                  daily_merge_engaged: bool = False,
                  repair_mode: bool = False,
                  collection_spidering_enabled: bool = True,
                  coll_status: int = SP_INPROGRESS,
                  has_urls_ready: bool = True) -> tuple[int, str]:
    """getSpiderStatusMsg, rung for rung (Spider.cpp:4026-4141)."""
    if not spidering_enabled_master:
        return (SP_ADMIN_PAUSED, "Spidering disabled in master controls. "
                "You can turn it back on there.")
    if read_only:
        return SP_ADMIN_PAUSED, "In read-only mode. Spidering off."
    if daily_merge_engaged:
        return SP_ADMIN_PAUSED, "Daily merge engaged, spidering paused."
    if repair_mode:
        return SP_ADMIN_PAUSED, "In repair mode, spidering paused."
    if not collection_spidering_enabled:
        return SP_PAUSED, "Spidering disabled in spider controls."
    if coll_status == SP_INITIALIZING:
        return SP_INITIALIZING, "Job is initializing."
    if coll_status == SP_ROUNDDONE:
        return (SP_ROUNDDONE, "Nothing currently available to spider. "
                "Change your url filters, try adding new urls, or wait "
                "for existing urls to be respidered.")
    if not has_urls_ready:
        # Spider.cpp:4101-4110 — deliberately reports INPROGRESS, not
        # COMPLETED (the commented-out SP_COMPLETED assignment).
        return (SP_INPROGRESS, "Nothing currently available to spider. "
                "Change your url filters, try adding new urls, or wait "
                "for existing urls to be respidered.")
    return SP_INPROGRESS, "Spider is in progress."


def _completed_time(status: int, completed: int) -> int:
    # PageCrawlBot.cpp:42-46: zero the completion time while running
    if status in (SP_INITIALIZING, SP_NOURLS, SP_INPROGRESS):
        return 0
    return completed


def crawlbot_status_json(info: CrawlInfo, status: int, status_msg: str,
                         job_created: int, job_completed: int,
                         now: int | None = None) -> str:
    """FORMAT_JSON envelope, byte-faithful key order
    (PageCrawlBot.cpp:48-72)."""
    now = int(time.time()) if now is None else now
    completed = _completed_time(status, job_completed)
    return ("{\"response\":{\n"
            f"\t\"statusCode\":{status},\n"
            f"\t\"statusMsg\":\"{status_msg}\",\n"
            f"\t\"jobCreationTimeUTC\":{job_created},\n"
            f"\t\"jobCompletionTimeUTC\":{completed},\n"
            f"\t\"urlsHarvested\":{info.urls_harvested},\n"
            f"\t\"pageCrawlAttempts\":{info.page_download_attempts},\n"
            f"\t\"pageCrawlSuccesses\":{info.page_download_successes},\n"
            f"\t\"currentTime\":{now},\n"
            f"\t\"currentTimeUTC\":{now}\n"
            "\t}\n"
            "}\n")


def crawlbot_status_xml(info: CrawlInfo, status: int, status_msg: str,
                        job_created: int, job_completed: int,
                        now: int | None = None) -> str:
    """FORMAT_XML envelope (PageCrawlBot.cpp:74-112)."""
    now = int(time.time()) if now is None else now
    completed = _completed_time(status, job_completed)
    return ("<response>\n"
            f"\t<statusCode>{status}</statusCode>\n"
            f"\t<statusMsg><![CDATA[{status_msg}]]></statusMsg>\n"
            f"\t<jobCreationTimeUTC>{job_created}</jobCreationTimeUTC>\n"
            f"\t<jobCompletionTimeUTC>{completed}</jobCompletionTimeUTC>\n"
            f"\t<urlsHarvested>{info.urls_harvested}</urlsHarvested>\n"
            f"\t<pageCrawlAttempts>{info.page_download_attempts}"
            "</pageCrawlAttempts>\n"
            f"\t<pageCrawlSuccesses>{info.page_download_successes}"
            "</pageCrawlSuccesses>\n"
            f"\t<currentTime>{now}</currentTime>\n"
            f"\t<currentTimeUTC>{now}</currentTimeUTC>\n"
            "</response>\n")


def daily_merge_due(now_utc: int, trigger_min: int, dow_list: str,
                    last_started: int) -> bool:
    """DailyMerge.cpp:108-182 — should host #0 enter merge mode for
    this collection right now?  Transcribed exactly, including:

    - trigger window [trigger, trigger+15] minutes into the UTC day
      ("do not start more than 15 mins after ... too bad");
    - >= 24 h since m_dailyMergeStarted;
    - the per-char ``atoi`` DOW parse (every digit position parses a
      number; only values 0-6 count);
    - the ``todayDOW = tm_wday + 1`` off-by-one: Saturday (tm_wday 6 ->
      7 > 6) NEVER triggers, and a list entry N fires on tm_wday N-1.
    """
    if trigger_min < 0:
        return False
    tt = time.gmtime(now_utc)
    elapsed_mins = tt.tm_hour * 60 + tt.tm_min
    if elapsed_mins < trigger_min:
        return False
    if elapsed_mins > trigger_min + 15:
        return False
    diff = now_utc - last_started
    if diff < 0:
        return False
    if diff < 24 * 3600:
        return False
    dow_counts = [0] * 8
    for i, ch in enumerate(dow_list):
        if not ch.isdigit():
            continue
        # atoi(s) from this position — "12" counts 12 at '1' (dropped,
        # > 6) and 2 at '2', like the reference's per-char loop
        j = i
        while j < len(dow_list) and dow_list[j].isdigit():
            j += 1
        num = int(dow_list[i:j])
        if 0 <= num <= 6:
            dow_counts[num] += 1
    today_dow = tt.tm_wday  # C tm_wday: 0=Sunday... but Python: 0=Monday
    # convert Python weekday (Mon=0) to C tm_wday (Sun=0)
    today_dow = (today_dow + 1) % 7
    today_dow += 1  # the reference's off-by-one (DailyMerge.cpp:146)
    if today_dow < 0 or today_dow > 6:
        return False  # "bad today dow" — Saturday can never merge
    return dow_counts[today_dow] != 0
