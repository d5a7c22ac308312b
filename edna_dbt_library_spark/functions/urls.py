"""URL normalization & decomposition — pure Column builders (zero
Python UDFs, zero shuffles; everything runs inside whole-stage codegen
at the scan).

Crawl corpora key almost everything on URLs: per-host quality priors,
domain mixing, URL-level dedup, robots/blocklist joins. Raw crawl URLs
disagree on case, default ports, fragments, tracking parameters, and
trailing slashes — the same resource appears as dozens of strings.
``canonicalize_url`` folds those equivalences deterministically so a
plain string equality (or the content-md5 id from sources/ingest) is a
URL identity at 100 TB scale.

Normalizations applied (conservative, lossless for resource identity):
  * scheme + host lowercased (path case is preserved — it is
    significant on most servers)
  * default ports stripped (:80 for http, :443 for https)
  * fragment dropped (never sent to the server)
  * tracking query parameters removed (utm_*, fbclid, gclid, msclkid,
    mc_eid, igshid, ref_src); remaining parameters sorted
    lexicographically so parameter order never splits identity
  * empty query/trailing "?" dropped; trailing slash on a non-root
    path trimmed
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tracking parameters dropped by canonicalize_url (lowercase match)
TRACKING_PARAMS = ("utm_", "fbclid", "gclid", "msclkid", "mc_eid", "igshid", "ref_src")


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_host(url: Column | str) -> Column:
    """Lowercased host (no port, no credentials); NULL when the value
    has no authority component."""
    c = _col(url)
    h = F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1)
    return F.when(h == "", F.lit(None).cast("string")).otherwise(F.lower(h))


#: common multi-part registrable suffixes (a pragmatic public-suffix
#: subset — swap in the full PSL for production crawls; each entry is
#: checked as a label-aligned host suffix)
MULTI_PART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.nz", "com.br", "com.cn", "com.mx",
    "co.in", "co.za", "com.sg", "com.tr", "com.ar",
)


def url_registered_domain(
    url: Column | str,
    levels: int = 2,
    multi_suffixes: tuple[str, ...] = MULTI_PART_SUFFIXES,
) -> Column:
    """Registrable domain: last ``levels`` host labels (``example.co``
    from ``a.b.example.co``), EXCEPT when the host ends in a known
    multi-part public suffix — ``www.example.co.uk`` groups as
    ``example.co.uk``, not the meaningless ``co.uk``. The suffix check
    is label-aligned (``.co.uk`` with the dot), so ``marco.uk`` is
    untouched and a host that IS a bare suffix falls through to the
    default. Pure when-chain Column algebra (codegen, zero shuffle);
    pass ``multi_suffixes=()`` for the plain ``levels``-label behavior.
    NULL propagates from url_host."""
    host = url_host(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)

    def last_k(k: int) -> Column:
        return F.array_join(F.slice(parts, n - k + 1, k), ".")

    out = F.when(n >= levels, last_k(levels)).otherwise(F.array_join(parts, "."))
    for sfx in multi_suffixes:
        k = len(sfx.split(".")) + 1  # suffix labels + the registrable label
        out = F.when(host.endswith("." + sfx) & (n >= k), last_k(k)).otherwise(out)
    return out


def _is_tracking(kv: Column) -> Column:
    key = F.lower(F.split_part(kv, F.lit("="), F.lit(1)))
    cond = F.lit(False)
    for p in TRACKING_PARAMS:
        cond = cond | (key.startswith(p) if p.endswith("_") else (key == p))
    return cond


def canonicalize_url(url: Column | str) -> Column:
    """Fold URL-equivalence classes to one canonical string (see module
    docstring). Input without a scheme://host prefix is returned
    trimmed-but-unchanged (relative references carry no authority to
    normalize); NULL stays NULL."""
    c = F.trim(_col(url))
    scheme = F.lower(F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    has_authority = scheme != ""
    host = url_host(c)
    port = F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?[^/:?#]+:(\d+)", 1)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    keep_port = F.when((port != "") & ~default_port, F.concat(F.lit(":"), port)).otherwise(
        F.lit("")
    )
    # path: strip query+fragment, empty -> "/", trim trailing slash on
    # non-root paths (case preserved — significant on most servers)
    rest = F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(rest == "", F.lit("/")).otherwise(rest)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, F.lit(1), F.length(path) - 1),
    ).otherwise(path)
    # query: drop tracking params, sort the rest, drop if empty.
    # Anchored lazily to the pre-fragment region so a '?' inside the
    # fragment ('http://h/x#a?b=1') never fabricates a query.
    query = F.regexp_extract(c, r"^[^#]*?\?([^#]*)", 1)
    kvs = F.filter(F.split(query, "&"), lambda kv: (kv != "") & ~_is_tracking(kv))
    sorted_q = F.array_join(F.array_sort(kvs), "&")
    qpart = F.when(sorted_q == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q))
    canon = F.concat(scheme, F.lit("://"), host, keep_port, path, qpart)
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(has_authority & host.isNotNull(), canon).otherwise(c)
    )
