"""Pure URL functions — canonicalization, storage uuid, 64-bit hashes.

Re-implements (from observed behavior, not code) the reference's URL
normalization quirks so that the URL-seen set and storage keys are
byte-identical to the reference for the same inputs:

- ``Page#to_absolute`` (reference lib/polipus/page.rb:171-195):
  1. strip a *simple* trailing fragment — the regex only matches
     ``#[a-zA-Z0-9_-]*$`` (so ``#frag/x`` is NOT stripped);
  2. percent-decode then re-encode with Ruby's legacy ``URI.encode``
     safe set ``-_.!~*'()a-zA-Z0-9;/?:@&=+$,[]`` (note: ``%`` and
     space are unsafe, ``#`` is unsafe);
  3. resolve relative references against the page URL (or
     ``<base href>``);
  4. empty path becomes ``/``.
- storage uuid = hex MD5 of the canonical URL string, optionally with
  the query string stripped (``?.*$`` regex) when
  ``include_query_string_in_saved_page`` is false
  (reference lib/polipus/storage/base.rb:11-17, lib/polipus.rb:390).

Golden oracle: MD5("http://www.google.com") ==
"ed646a3334ca891fd3467db131372140" (reference
spec/polipus/storage/memory_store_spec.rb:11).

All functions here are deterministic, dependency-free, and intended to
be called from vectorized ``map_batches`` bodies (listcomp over a
column is ~1-2 us/row; the stage parallelizes across blocks).
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import quote_from_bytes, unquote_to_bytes, urljoin, urlsplit

# Ruby URI.encode default safe set (everything else is percent-escaped).
_RUBY_SAFE = b"-_.!~*'()abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789;/?:@&=+$,[]"
_FRAGMENT_RE = re.compile(r"#[a-zA-Z0-9_-]*$")
_QUERY_RE = re.compile(r"\?.*$", re.S)
# fast path: absolute http(s) URL, every char in the Ruby-safe set,
# no '%' (decode is identity), no '#' (nothing to strip), non-empty
# path.  For such strings the full canonicalization is the identity,
# byte-for-byte (verified in tests against the slow path).
_FAST_RE = re.compile(r"^https?://[A-Za-z0-9._~\-]+(:[0-9]+)?/[A-Za-z0-9._~!$&'()*+,;=:@/\-]*(\?[A-Za-z0-9._~!$&'()*+,;=:@/\-]+)?$")
_DOTSEG_RE = re.compile(r"/\.{1,2}(/|\?|$)")


def ruby_uri_escape_roundtrip(url: str) -> str:
    """Ruby ``URI.encode(URI.decode(url))``: fully percent-decode, then
    re-encode every byte outside the legacy safe set."""
    raw = unquote_to_bytes(url)
    return quote_from_bytes(raw, safe=_RUBY_SAFE)


def canonicalize(link: str | None, base: str | None = None) -> str | None:
    """Reference ``to_absolute`` semantics. Returns None for rejects."""
    if link is None:
        return None
    link = str(link)
    if _FAST_RE.match(link) and not _DOTSEG_RE.search(link):
        return link
    return _canonicalize_slow(link, base)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 — Ruby's URI#merge applies this to absolute
    references too; python's urljoin additionally mangles ';' params,
    so absolute links are recomposed manually."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    if path.endswith(("/.", "/..")) and (not out or out[-1] not in ("", ".", "..")):
        out.append("")
    return "/".join(out)


def _canonicalize_slow(link: str, base: str | None = None) -> str | None:
    link = _FRAGMENT_RE.sub("", link)
    try:
        link = ruby_uri_escape_roundtrip(link)
    except (ValueError, UnicodeError):
        return None
    p = urlsplit(link)
    if p.scheme and p.netloc:
        # absolute: Ruby merge keeps everything except dot segments
        absolute = f"{p.scheme}://{p.netloc}{_remove_dot_segments(p.path)}"
        if p.query:
            absolute += f"?{p.query}"
        if p.fragment:
            absolute += f"#{p.fragment}"
    else:
        absolute = urljoin(base, link) if base else link
    # empty path -> "/"
    parts = urlsplit(absolute)
    if parts.scheme and parts.netloc and parts.path == "":
        absolute = f"{parts.scheme}://{parts.netloc}/"
        if parts.query:
            absolute += f"?{parts.query}"
        if parts.fragment:
            absolute += f"#{parts.fragment}"
    return absolute


def strip_query(url: str) -> str:
    """``url.gsub(/\\?.*$/, '')`` — reference lib/polipus.rb:390,432."""
    return _QUERY_RE.sub("", url)


# fast-path splitter for well-formed absolute URLs: scheme://netloc
# (netloc = everything up to the first '/', '?' or '#'), matching
# urlsplit's netloc delimiting exactly
_NETLOC_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)")


def host_of(url: str) -> str:
    m = _NETLOC_RE.match(url)
    if m:
        netloc = m.group(1)
        # hot path: no userinfo/port (the overwhelming majority)
        if "@" not in netloc and ":" not in netloc:
            return netloc.lower()
        return netloc.split("@")[-1].split(":")[0].lower()
    return urlsplit(url).netloc.split("@")[-1].split(":")[0].lower()


def path_of(url: str) -> str:
    """Ruby ``uri.request_uri``: path + '?' + query (path '' -> '/')."""
    m = _NETLOC_RE.match(url)
    if m:
        rest = url[m.end() :]
        f = rest.find("#")
        if f >= 0:
            rest = rest[:f]
        if not rest:
            return "/"
        if rest[0] == "?":
            return "/" + rest
        return rest
    p = urlsplit(url)
    path = p.path or "/"
    return f"{path}?{p.query}" if p.query else path


def page_uuid(url: str, include_query_string: bool = True) -> str:
    """Storage key: MD5 hex of the (optionally query-stripped) URL."""
    if not include_query_string:
        url = strip_query(url)
    return hashlib.md5(url.encode("utf-8", "surrogatepass")).hexdigest()


def hash64(s: str) -> int:
    """Stable 64-bit hash (first 8 bytes of MD5, big-endian, as a
    non-negative int).  Used for the cuckoo-filter fingerprint space,
    shard routing and intra-round distinct keys."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8", "surrogatepass")).digest()[:8], "big")


def url_hash64(url: str, include_query_string: bool = True) -> int:
    if not include_query_string:
        url = strip_query(url)
    return hash64(url)


def host_hash64(host: str) -> int:
    return hash64(host)


def hash64_column(urls, include_query_string: bool = True):
    """Vectorized-ish helper: list[int] of url_hash64 over a column."""
    return [url_hash64(u, include_query_string) for u in urls]
