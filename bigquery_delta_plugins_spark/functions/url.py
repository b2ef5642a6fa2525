"""URL canonicalization — the dedup key-prep step of a web-crawl
pipeline (Common-Crawl-style corpora key pages by canonical URL before
any content-level dedup; the reference's primary key for pages tables
is ``url``).

Pure Catalyst regexp/array expression chain — no UDF, whole-stage
codegen, so at 100 TB this is a free projection on the scan.  Rules
implemented (the conservative, semantics-preserving subset every
canonicalizer agrees on):

1. drop the fragment (``#...`` — never sent to the server);
2. lowercase scheme and authority (host names are case-insensitive,
   paths are NOT — ``/Docs`` stays ``/Docs``);
3. strip the scheme's default port (``https://h:443`` → ``https://h``,
   ``http://h:80`` → ``http://h``; ``https://h:80`` is a REAL
   non-default port and is kept).  The match anchors on the LAST colon
   of the authority, so userinfo (``https://u:p@h:443``) and bracketed
   IPv6 hosts (``https://[::1]:443``) strip correctly too — the ``$``
   anchor keeps ``:8443``/``:443443`` untouched;
4. collapse duplicate slashes in the path and strip trailing slashes
   (``/a//b/`` → ``/a/b``);
5. sort query parameters byte-wise (param order is almost never
   semantic; sorting makes ``?b=2&a=1`` and ``?a=1&b=2`` one key).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_HOST = r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?]*)"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module rules."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    base = F.regexp_extract(no_frag, r"^([^?]*)", 1)
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)

    authority = F.lower(F.regexp_extract(base, _SCHEME_HOST, 1))
    authority = F.regexp_replace(authority, r"^(https://.*):443$", r"$1")
    authority = F.regexp_replace(authority, r"^(http://.*):80$", r"$1")

    path = F.regexp_replace(base, _SCHEME_HOST, "")
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.regexp_replace(path, r"/+$", "")

    canon_q = F.when(
        query != "",
        F.concat(F.lit("?"), F.array_join(F.array_sort(F.split(query, "&")), "&")),
    ).otherwise(F.lit(""))
    return F.concat(authority, path, canon_q)
