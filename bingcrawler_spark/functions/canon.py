"""URL canonicalization and string scrubbers (SURVEY.md §2.3 P1, P2, P3, P16).

Each op exists twice: a pure-Python reference (`py_*`, used by the oracle and
unit tests) and a Spark Column expression (`*_col`, JVM-side, codegen'd — the
hot path never leaves the JVM for these).

Reference semantics reproduced exactly (public repo kelleszzz/BingCrawler):
  P1 removeSuffix      Util.java:368-376  — ``matches("(.+)#(.*)")`` with a
                        GREEDY group 1, i.e. strip from the LAST ``#`` — but
                        only when at least one char precedes it ("a#b#c" →
                        "a#b"; "#x" unchanged; "ab#" → "ab").
  P2 getHostUrl        Util.java:345-364  — optional ``(http|https)://``
                        prefix kept verbatim + remainder cut at the first
                        ``/``; NOT lowercased (so parse_url, which lowercases
                        and drops the scheme, is wrong here); empty result
                        falls back to the input ("ftp://x/y" → "ftp:" — quirk
                        preserved).
  P3 entity unescape   Util.java:205-215  — fixed 8-entity table applied to
                        extracted link urls.
  P16 md5 hex          Md5.java:8-34      — MD5 of url chars cast to bytes;
                        identical to utf-8 MD5 for ASCII urls (urls in scope
                        are ASCII — asserted in tests).
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- P1: canon

# Java Pattern.matches("(.+)#(.*)") — greedy, whole-string match; group 1
# therefore ends at the LAST '#'.  Java's '.' excludes ALL five line
# terminators (\n \r \u0085 \u2028 \u2029), not just \n like Python's, so
# the twin spells the class out — a URL containing any of them fails the
# whole-string match and passes through unchanged.
_JAVA_DOT = "[^\n\r\x85\u2028\u2029]"
_FRAGMENT_RE = re.compile(f"({_JAVA_DOT}+)#({_JAVA_DOT}*)")


def py_canon_url(url: str) -> str:
    """Strip the last '#fragment'; a bare '#frag' (no char before '#') stays."""
    m = _FRAGMENT_RE.fullmatch(url)
    return m.group(1) if m else url


def canon_url_col(url: Column) -> Column:
    # after-last-'#' suffix; prefix length = len - len(suffix) - 1.
    # The line-terminator guard mirrors the Java/Python twin exactly:
    # Java's '.' matches none of \n \r \u0085 \u2028 \u2029, so
    # Pattern.matches over a URL containing any of them FAILS and the
    # URL passes through unchanged — a bare substring strip here would
    # diverge from py_canon_url (and the crawl oracle) on those.
    frag = F.substring_index(url, "#", -1)
    prefix_len = F.length(url) - F.length(frag) - 1
    return F.when(
        url.contains("#")
        & (prefix_len >= 1)
        & ~url.rlike("[\n\r\u0085\u2028\u2029]"),
        url.substr(F.lit(1), prefix_len),
    ).otherwise(url)


# ---------------------------------------------------------------- P2: host

# group 0 of this regex == optional protocol + everything up to the first '/'
_HOST_RE = re.compile(r"^(?:(?:http|https)://)?[^/\n]*")


def py_host_url(url: str) -> str:
    m = _HOST_RE.match(url)
    host_url = m.group(0) if m else ""
    return url if host_url == "" else host_url


def host_url_col(url: Column) -> Column:
    out = F.regexp_extract(url, r"^(?:(?:http|https)://)?[^/\n]*", 0)
    return F.when(out == "", url).otherwise(out)


def py_host_name(url: str) -> str:
    """Bare hostname (politeness / partition key): host_url minus protocol."""
    h = py_host_url(url)
    return h.split("://", 1)[1] if "://" in h else h


def host_name_col(url: Column) -> Column:
    h = host_url_col(url)
    return F.when(h.contains("://"), F.substring_index(h, "://", -1)).otherwise(h)


# ------------------------------------------------------------- P3: entities

_ENTITIES: list[tuple[str, str]] = [
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&yen;", "¥"),
    ("&cent;", "¢"),
    ("&copy;", "©"),
    ("&reg;", "®"),
    ("&trade;", "™"),
]


def py_unescape_entities(s: str) -> str:
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return s


def unescape_entities_col(s: Column) -> Column:
    out = s
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


# ------------------------------------------------------------------ P16: md5


def py_md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def md5_col(s: Column) -> Column:
    return F.md5(s)


# ---------------------------------------------------------- P15: scrubbers

_BAD_FILE_CHARS = '/\\:*?"<>|'


def py_scrub_filename(s: str) -> str:
    """P15 replaceFileBadLetter (Util.java:168-174): each of /\\:*?"<>|
    becomes '~' (the reference replaceAll with a single-char alternation —
    one '~' per bad character)."""
    return "".join("~" if c in _BAD_FILE_CHARS else c for c in s)


def scrub_filename_col(s: Column) -> Column:
    """Column twin of py_scrub_filename — translate() maps char-for-char,
    exactly the replaceAll semantics (JVM-side, codegen-friendly)."""
    return F.translate(s, _BAD_FILE_CHARS, "~" * len(_BAD_FILE_CHARS))
