"""Clusterdb cluster-rec keys (functions/clusterdb.py)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from open_source_search_engine_spark.functions.clusterdb import (
    SITE_HASH26_MASK, cluster_docid, cluster_has_adult, cluster_is_del,
    cluster_language, cluster_site_hash26, host_hash32,
    make_cluster_rec_key, site_hash26)
from open_source_search_engine_spark.functions.ghash import (
    hash64b, hash_table)
from open_source_search_engine_spark.search.results import (
    CR_CLUSTERED, CR_OK, filter_results)


def _ref_make_key(docid, family, lang, site, is_del=False, is_half=False):
    """Literal transcription of Clusterdb.cpp:149-177."""
    n1 = (docid >> 29) & 0x1FF
    n0 = (docid << 35) & 0xFFFFFFFFFFFFFFFF
    if family:
        n0 |= 0x0000000400000000
    n0 |= (lang & 0x3F) << 28
    n0 |= (site & 0x03FFFFFF) << 2
    if is_del:
        n0 &= ~1 & 0xFFFFFFFFFFFFFFFF
    else:
        n0 |= 1
    if is_half:
        n0 |= 2
    return n1, n0


class TestPackUnpack:
    CASES = [
        (0, False, 0, 0, False),
        (1, True, 63, SITE_HASH26_MASK, False),
        ((1 << 38) - 1, True, 17, 0x123456, True),
        (0x23456789A, False, 5, 0x03FFFFFF, False),
        (12345678901, True, 0, 0x1, False),
    ]

    def test_matches_reference_transcription(self):
        for d, fam, lang, site, dele in self.CASES:
            n1, n0 = make_cluster_rec_key([d], [fam], [lang], [site],
                                          is_del=[dele])
            rn1, rn0 = _ref_make_key(d, fam, lang, site, is_del=dele)
            assert int(n1[0]) == rn1, (d, fam)
            assert int(np.asarray(n0).view(np.uint64)[0]) == rn0, (d, fam)

    def test_round_trip(self):
        ds = [c[0] for c in self.CASES]
        fams = [c[1] for c in self.CASES]
        langs = [c[2] for c in self.CASES]
        sites = [c[3] for c in self.CASES]
        dels = [c[4] for c in self.CASES]
        n1, n0 = make_cluster_rec_key(ds, fams, langs, sites, is_del=dels)
        assert list(cluster_docid(n1, n0)) == ds
        assert list(cluster_site_hash26(n0)) == sites
        assert list(cluster_language(n0)) == langs
        assert list(cluster_has_adult(n0)) == fams
        assert list(cluster_is_del(n0)) == dels

    def test_del_bit_inverted(self):
        # live recs have bit 0 SET (Clusterdb.cpp:170-172); the Msg22
        # titledb scan's "skip negative recs" checks the same convention.
        _, n0 = make_cluster_rec_key([7], [False], [0], [0], is_del=[False])
        assert int(np.asarray(n0).view(np.uint64)[0]) & 1 == 1


class TestSiteHash:
    def test_host_hash32_is_low_32_of_table_hash(self):
        hosts = [b"www.example.com", b"sub.host.co.uk", b"a.de"]
        got = host_hash32(hosts)
        for g, h in zip(got, hosts):
            assert int(g) == (hash64b(h) & 0xFFFFFFFF)

    def test_site_hash26_mask(self):
        hosts = [b"www.example.com", b"x.org"]
        assert all(0 <= int(v) <= SITE_HASH26_MASK for v in site_hash26(hosts))
        assert list(site_hash26(hosts)) == [
            int(v) & SITE_HASH26_MASK for v in host_hash32(hosts)]


class TestHash26Clustering:
    def _results(self, spark, urls):
        rows = [{"rank": i, "url": u, "lang": "en", "is_adult": False,
                 "title": f"t{i}", "summary": f"s{i}"}
                for i, u in enumerate(urls)]
        return spark.createDataFrame(pd.DataFrame(rows))

    def test_hash26_mode_matches_host_mode_without_collisions(self, spark):
        urls = [f"http://h{i % 3}.example.com/p{i}" for i in range(9)]
        base = self._results(spark, urls)
        a = {r["rank"]: r["cluster_level"]
             for r in filter_results(base, max_per_site=2,
                                     dedup_percent=0).collect()}
        b = {r["rank"]: r["cluster_level"]
             for r in filter_results(base, max_per_site=2, dedup_percent=0,
                                     site_key_hash26=True).collect()}
        assert a == b
        assert sum(1 for v in a.values() if v == CR_CLUSTERED) == 3

    def test_hash26_collision_clusters_distinct_hosts(self, spark):
        # Two distinct hosts colliding in 26 bits — found by brute force
        # over md5-derived names (structured h{i}.example.com names span
        # a low-dimensional XOR subspace under tabulation hashing and
        # yield NO birthday collisions; high-entropy bytes do).  The
        # collision is the reference quirk the mode exists to reproduce.
        pair = ["dd3c407bbd25.com", "6ec52fc9886c.com"]
        assert pair[0] != pair[1]
        assert int(site_hash26([pair[0].encode()])[0]) == \
            int(site_hash26([pair[1].encode()])[0])
        urls = [f"http://{pair[0]}/a", f"http://{pair[1]}/b"]
        base = self._results(spark, urls)
        out = {r["rank"]: r["cluster_level"]
               for r in filter_results(base, max_per_site=1, dedup_percent=0,
                                       site_key_hash26=True).collect()}
        # rank 0 visible, rank 1 clustered AS IF same site (the quirk)
        assert out[0] == CR_OK and out[1] == CR_CLUSTERED
        host_mode = {r["rank"]: r["cluster_level"]
                     for r in filter_results(base, max_per_site=1,
                                             dedup_percent=0).collect()}
        assert host_mode[1] == CR_OK  # string mode keeps them apart
