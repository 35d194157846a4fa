"""Frozen wikitext extraction semantics (pure functions, no Ray).

These pin down the reference's per-page extraction contract so the
"byte-identical extracted text per url" invariant is testable:

- link syntax ``[[Target]]`` / ``[[Target|anchor]]`` — target is the part
  before the first ``|`` (reference: bliki ``WikiPatternMatcher.links``
  used at WikiProcessor.kt:45-46,53);
- ``[[Target#Section]]`` links to ``Target`` (MediaWiki semantics);
- redirect pages start with ``#REDIRECT [[Target]]`` (case-insensitive
  keyword; reference: ``matcher.isRedirect`` / ``matcher.redirectText``,
  WikiProcessor.kt:49-51);
- MediaWiki first-letter case-insensitivity: capitalize exactly the first
  character, rest untouched (``possiblyCapitalize``,
  WikiProcessor.kt:114-121);
- per-page dedup preserving first-occurrence order (``.distinct()``,
  WikiProcessor.kt:55);
- underscores in targets are equivalent to spaces; surrounding whitespace
  stripped; empty targets dropped.

``extracted_text_bytes`` defines the canonical byte serialization of a
page's extraction result used by the golden fixtures.
"""

from __future__ import annotations

import re

_LINK_RE = re.compile(r"\[\[(.*?)\]\]", re.DOTALL)
_REDIRECT_RE = re.compile(r"^\s*#REDIRECT\s*:?\s*\[\[(.*?)\]\]", re.IGNORECASE | re.DOTALL)


def capitalize_first(name: str) -> str:
    """Uppercase the first character only (WikiProcessor.kt:114-121).

    Python's ``str.upper`` on one char matches Kotlin ``uppercaseChar``
    for the BMP characters we care about; multi-char expansions (e.g.
    ``ß`` → ``SS``) are accepted as this engine's frozen semantics.
    """
    if name and not name[0].isupper():
        return name[0].upper() + name[1:]
    return name


def normalize_link_target(raw: str) -> str | None:
    """``[[ raw ]]`` inner text -> canonical target title, or None to drop."""
    target = raw.split("|", 1)[0]
    target = target.split("#", 1)[0]
    target = target.replace("_", " ").strip()
    if not target:
        return None
    return capitalize_first(target)


def parse_wikitext(text: str) -> tuple[bool, str | None, list[str]]:
    """Parse one page body.

    Returns ``(is_redirect, redirect_target, links)`` where ``links`` is
    the ordered, deduped, capitalized list of link targets (for a
    redirect page: the single redirect target, mirroring
    WikiProcessor.kt:49-51 where a redirect's only out-edge is its
    target).
    """
    m = _REDIRECT_RE.match(text)
    if m:
        target = normalize_link_target(m.group(1))
        return True, target, ([target] if target is not None else [])
    seen: set[str] = set()
    links: list[str] = []
    for raw in _LINK_RE.findall(text):
        t = normalize_link_target(raw)
        if t is not None and t not in seen:
            seen.add(t)
            links.append(t)
    return False, None, links


def extracted_text_bytes(is_redirect: bool, redirect_target: str | None,
                         links: list[str]) -> bytes:
    """Canonical byte serialization of a page's extraction result.

    This is the payload the "byte-identical extracted text per url"
    invariant is asserted on (golden fixtures + differential tests).
    """
    if is_redirect:
        return b"#REDIRECT\t" + (redirect_target or "").encode("utf-8")
    return b"\n".join(l.encode("utf-8") for l in links)
