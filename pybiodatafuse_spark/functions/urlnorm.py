"""URL canonicalization.

The reference's identifier-normalization analogue is curie cleanup
(``/root/reference/src/pyBiodatafuse/utils.py:286-310``) and per-source prefix
rewrites (``annotators/wikipathways.py:183-224``). For a link graph the
identifier is a URL; canonical form decides vertex identity, so it must be one
deterministic function shared by the pure-Python oracle and the Spark paths.

Two implementations with identical semantics:

- :func:`canonicalize_url` — pure Python, used inside the link-extraction
  pandas UDF and by tests/oracles.
- :func:`canonicalize_url_col` — built-in column expressions (JVM-side,
  whole-stage-codegen'd) for when the input is already a URL column; a unit
  test asserts agreement with the Python version.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def canonicalize_url(url: str) -> str | None:
    """Canonical form: lowercase scheme+host, strip default port, drop
    fragment, collapse empty path to "/". Returns None for non-http(s) or
    unparseable urls (those never become vertices)."""
    if not url:
        return None
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    netloc = parts.netloc.lower()
    default = _DEFAULT_PORTS[scheme]
    if netloc.endswith(default):
        netloc = netloc[: -len(default)]
    if not netloc:
        return None
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def canonicalize_url_col(url: Column) -> Column:
    """Column-expression canonicalization (same semantics as
    :func:`canonicalize_url` for well-formed absolute http(s) urls).

    Kept entirely in built-in expressions so Catalyst codegens it — this is
    the 100-TB hot path; the Python twin exists for the oracle invariant.
    """
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    netloc = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    netloc = F.when(scheme == "http", F.regexp_replace(netloc, r":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(netloc, r":443$", "")).otherwise(netloc)
    )
    after = F.regexp_extract(rest, r"^[^/?#]*([^#]*)", 1)  # path+query, fragment dropped
    path_query = F.when(after == "", F.lit("/")).otherwise(
        F.when(after.startswith("?"), F.concat(F.lit("/"), after)).otherwise(after)
    )
    ok = scheme.isin("http", "https") & (netloc != "")
    return F.when(ok, F.concat(scheme, F.lit("://"), netloc, path_query)).otherwise(F.lit(None))
