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
  stripped; empty targets dropped;
- markup robustness (bliki-parity semantics, frozen here): HTML comments,
  ``<nowiki>`` spans and ``{{templates}}`` (nested) contribute no links;
  ``[[File:x|caption with [[Y]]]]`` yields BOTH the outer ``File:x``
  target (which resolves to nothing in the main namespace and is dropped
  + counted like any null link) and the nested ``Y``.

``extracted_text_bytes`` defines the canonical byte serialization of a
page's extraction result used by the golden fixtures.
"""

from __future__ import annotations

import re

_LINK_RE = re.compile(r"\[\[(.*?)\]\]", re.DOTALL)
_REDIRECT_RE = re.compile(r"^\s*#REDIRECT\s*:?\s*\[\[(.*?)\]\]", re.IGNORECASE | re.DOTALL)

# markup that must not contribute links (bliki strips these before its
# link walk, WikiPatternMatcher; the reference consumes matcher.links at
# WikiProcessor.kt:55): HTML comments, <nowiki> spans, and {{templates}}
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_NOWIKI_RE = re.compile(r"<nowiki>.*?</nowiki>", re.DOTALL | re.IGNORECASE)
_TEMPLATE_RE = re.compile(r"\{\{[^{}]*\}\}", re.DOTALL)
# one C-speed scan deciding whether strip_markup must run at all — the
# overwhelmingly common markup-free page stays on the regex fast path
_MARKUP_TRIGGER_RE = re.compile(r"\{\{|<!--|<nowiki", re.IGNORECASE)


def strip_markup(text: str) -> str:
    """Remove comment / nowiki / template markup so their contents never
    produce links. Templates strip innermost-first so nesting unwinds;
    bounded iterations guard pathological inputs."""
    text = _COMMENT_RE.sub(" ", text)
    text = _NOWIKI_RE.sub(" ", text)
    for _ in range(16):  # nesting depth bound
        text, n = _TEMPLATE_RE.subn(" ", text)
        if not n:
            break
    return text


def iter_link_targets(text: str):
    """Yield raw ``[[...]]`` inner texts, handling NESTED links (a
    ``[[File:x|caption with [[Y]]]]`` image link): the non-greedy regex
    stops at the first ``]]`` and would both truncate the outer link and
    swallow the nested one.

    Single O(n) pass with an explicit bracket stack (no recursion — deep
    nesting can't blow the interpreter stack; no restarts — a stray
    unmatched ``[[`` can't go quadratic): push every ``[[``, pop on
    ``]]`` to form a balanced pair; unmatched openers are literal text,
    exactly how MediaWiki renders them, and links AFTER a stray opener
    still match. Pairs yield in document order of their ``[[`` (outer
    before its nested caption links). Each pair's target is its inner
    text up to the first ``|`` or nested ``[[``."""
    stack: list[int] = []
    pairs: list[tuple[int, int]] = []
    i = 0
    n = len(text)
    while i < n - 1:
        two = text[i:i + 2]
        if two == "[[":
            stack.append(i)
            i += 2
        elif two == "]]":
            if stack:
                pairs.append((stack.pop(), i))
                i += 2
            else:
                i += 1
        else:
            i += 1
    for s, e in sorted(pairs):
        head = text[s + 2:e].split("|", 1)[0]
        if "[[" in head:  # nested link before any pipe — truncate
            head = head[:head.find("[[")]
        yield head


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
    if _MARKUP_TRIGGER_RE.search(text):
        text = strip_markup(text)
    # fast path: the C-speed regex — correct unless a link NESTS another
    # ([[File:x|cap [[Y]]]]), which always leaves a stray '[[' inside a
    # match; only then run the bracket-aware Python scanner
    raws = _LINK_RE.findall(text)
    if any("[[" in r for r in raws):
        raws = iter_link_targets(text)
    seen: set[str] = set()
    links: list[str] = []
    for raw in raws:
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
