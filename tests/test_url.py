"""URL canonicalization unit matrix (functions/url.py)."""

import pytest
from pyspark.sql import functions as F

from bigquery_delta_plugins_spark.functions.url import canonicalize_url

CASES = [
    # lowercase scheme+host, keep path case
    ("HTTPS://WWW.Ex.COM/Docs/A", "https://www.ex.com/Docs/A"),
    # default ports stripped per scheme
    ("https://h.com:443/a", "https://h.com/a"),
    ("http://h.com:80/a", "http://h.com/a"),
    # NON-default ports kept (https:80 / http:443 / anything else)
    ("https://h.com:80/a", "https://h.com:80/a"),
    ("http://h.com:443/a", "http://h.com:443/a"),
    ("https://h.com:8080/a", "https://h.com:8080/a"),
    # last-colon anchoring: userinfo and bracketed IPv6 authorities
    # also strip their default port; near-miss ports stay
    ("https://u:p@h.com:443/a", "https://u:p@h.com/a"),
    ("https://[::1]:443/a", "https://[::1]/a"),
    ("http://[2001:db8::1]:80/a", "http://[2001:db8::1]/a"),
    ("https://h.com:8443/a", "https://h.com:8443/a"),
    ("https://[::443]/a", "https://[::443]/a"),
    # fragment dropped, even with query
    ("https://h.com/a#frag", "https://h.com/a"),
    ("https://h.com/a?x=1#frag", "https://h.com/a?x=1"),
    # duplicate + trailing slashes
    ("https://h.com//a///b/", "https://h.com/a/b"),
    # query param sort is byte-wise
    ("https://h.com/a?b=2&a=1&c=0", "https://h.com/a?a=1&b=2&c=0"),
    # bare authority
    ("https://H.com", "https://h.com"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_canonicalize_url(spark, raw, expected):
    got = (
        spark.createDataFrame([(raw,)], ["u"])
        .select(canonicalize_url(F.col("u")).alias("c"))
        .first()["c"]
    )
    assert got == expected, raw
