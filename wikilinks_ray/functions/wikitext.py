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

import math
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


def iter_link_inners(text: str):
    """Yield FULL raw ``[[...]]`` inner texts (pipes and all), handling
    NESTED links (a ``[[File:x|caption with [[Y]]]]`` image link): the
    non-greedy regex stops at the first ``]]`` and would both truncate
    the outer link and swallow the nested one.

    Single O(n) pass with an explicit bracket stack (no recursion — deep
    nesting can't blow the interpreter stack; no restarts — a stray
    unmatched ``[[`` can't go quadratic): push every ``[[``, pop on
    ``]]`` to form a balanced pair; unmatched openers are literal text,
    exactly how MediaWiki renders them, and links AFTER a stray opener
    still match. Pairs yield in document order of their ``[[`` (outer
    before its nested caption links)."""
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
        yield text[s + 2:e]


def _target_head(inner: str) -> str:
    """A link's target head: inner text up to the first ``|`` or nested
    ``[[`` (a nested link before any pipe truncates the target)."""
    head = inner.split("|", 1)[0]
    if "[[" in head:
        head = head[:head.find("[[")]
    return head


def iter_link_targets(text: str):
    """Yield each balanced ``[[...]]`` pair's target head (see
    :func:`iter_link_inners` for the scan, :func:`_target_head` for the
    head rule)."""
    for inner in iter_link_inners(text):
        yield _target_head(inner)


_INNER_TPL_RE = re.compile(r"\{\{([^{}]*)\}\}", re.DOTALL)


def normalize_template_name(raw: str) -> str | None:
    """``{{ raw | ... }}`` head -> canonical template page title suffix
    (the part after ``Template:``), or None to drop (empty / parser
    function / parameter placeholder)."""
    name = raw.replace("_", " ").strip()
    if not name or name.startswith("#") or name.startswith("{"):
        return None
    return capitalize_first(name)


def _split_pipes(inner: str) -> list[str]:
    """Pipe-split an invocation's inner text; pipes inside ``[[...]]``
    links are NOT separators (MediaWiki: an anchor pipe inside an
    argument). First element is the raw name."""
    parts: list[str] = []
    depth = 0
    start = 0
    i = 0
    n = len(inner)
    while i < n:
        if inner.startswith("[[", i):
            depth += 1
            i += 2
        elif inner.startswith("]]", i):
            depth = max(0, depth - 1)
            i += 2
        else:
            if depth == 0 and inner[i] == "|":
                parts.append(inner[start:i])
                start = i + 1
            i += 1
    parts.append(inner[start:])
    return parts


def _arg_eq_split(a: str) -> int:
    """Index of the first ``=`` that acts as a name/value separator in a
    template argument (``-1`` if none): a ``=`` inside a link is text."""
    eq = a.find("=")
    if eq > 0 and a.find("[[", 0, eq) == -1:
        return eq
    return -1


def _classify_args(args: list[str]) -> tuple[list[str], dict[str, str]]:
    """Template-transclusion arg semantics: ``k=v`` entries become named
    parameters, the rest positional. Parser functions do NOT use this —
    MediaWiki/bliki pass them the raw pipe-split list and only
    ``#switch`` interprets ``=`` (see eval_parser_function)."""
    positional: list[str] = []
    named: dict[str, str] = {}
    for a in args:
        eq = _arg_eq_split(a)
        if eq >= 0:
            named[a[:eq].strip()] = a[eq + 1:].strip()
        else:
            positional.append(a)
    return positional, named


def split_template_args(inner: str) -> tuple[str, list[str], dict[str, str]]:
    """Split an invocation's inner text ``Name|a|k=v`` into
    ``(raw_name, positional, named)`` with transclusion semantics."""
    parts = _split_pipes(inner)
    positional, named = _classify_args(parts[1:])
    return parts[0], positional, named


_PARAM_RE = re.compile(r"\{\{\{([^{}|]*)(?:\|([^{}]*))?\}\}\}", re.DOTALL)


def _substitute_params(body: str, positional: list[str],
                       named: dict[str, str]) -> str:
    """Replace ``{{{1}}}`` / ``{{{name|default}}}`` placeholders in a
    template body. Frozen semantics: an unset parameter with a default
    takes the default; without one it becomes empty (MediaWiki would
    leave the literal placeholder — we drop it so no ``{{{`` debris
    reaches the link scan)."""
    def repl(m: re.Match) -> str:
        key = m.group(1).strip()
        if key in named:
            return named[key]
        if key.isdigit():
            idx = int(key) - 1
            if 0 <= idx < len(positional):
                return positional[idx]
        return m.group(2) if m.group(2) is not None else ""

    return _PARAM_RE.sub(repl, body)


_MAGIC_WORDS = {"PAGENAME", "FULLPAGENAME", "BASEPAGENAME", "SUBPAGENAME"}
_CASE_FNS = {"lc": str.lower, "uc": str.upper,
             "lcfirst": lambda s: s[:1].lower() + s[1:],
             "ucfirst": lambda s: s[:1].upper() + s[1:]}


def eval_parser_function(raw_name: str, args: list[str],
                         page_title: str | None) -> str | None:
    """Evaluate the bliki-parity parser-function / magic-word subset;
    None = not a (supported) function, fall through to template lookup.

    ``args`` is the RAW pipe-split argument list, positional order
    preserved — MediaWiki/bliki split parser-function arguments by pipe
    only; ``=`` carries meaning only inside ``#switch``. (A ``#if``
    branch like ``style="..." [[Then]]`` is one branch, not a named
    arg.)

    Frozen subset (the reference's bliki ``WikiModel`` evaluates these
    before the link walk, WikiProcessor.kt:45-46):

    - ``{{#if: test | then | else}}`` — non-empty trimmed test picks
      ``then``; branches trim; missing branch = empty.
    - ``{{#ifeq: a | b | then | else}}`` — trimmed string equality.
    - ``{{#switch: key | c1 = v1 | c2 | c3 = v3 | #default = d | f}}``
      — cases walked in order; a bare case name falls through to the
      next ``= value`` (MediaWiki fallthrough chains); ``#default`` or
      a trailing bare value is the no-match result.
    - ``{{#expr: e}}`` — INTEGER-ONLY arithmetic (``+ - * div mod
      round``, parentheses, unary minus). Float expressions, ``/`` and
      comparisons are unsupported and return None (stay in text,
      stripped — documented bliki divergence).
    - ``{{lc:|uc:|lcfirst:|ucfirst: x}}`` — case transforms.
    - ``{{PAGENAME}}``-family magic words — the current page title
      (title == base == sub: this engine's corpus has no subpages).
    - ``{{#ifexist: title | then | else}}`` — always the ELSE branch:
      no page table is visible at parse time, matching bliki's
      page-store-less default WikiModel.
    - ``{{#time: fmt | timestamp}}`` — EXPLICIT-timestamp subset only
      (see :func:`_eval_time`); ``{{#time: fmt}}`` ("now") is
      nondeterministic and stays unsupported.

    Unsupported forms (``#time`` without a timestamp, locale format
    codes, float ``#expr``, ...) return None: they stay in the text and
    ``strip_markup`` drops them, contributing no links — the
    pre-round-4 behavior for ALL functions.
    """
    head = raw_name.strip()
    if ":" not in head:
        if head in _MAGIC_WORDS:
            return page_title or ""
        return None
    fn, _, arg0 = head.partition(":")
    fn = fn.strip().lower()
    arg0 = arg0.strip()
    if fn in _CASE_FNS:
        return _CASE_FNS[fn](arg0)
    if fn == "#expr":
        return _eval_int_expr(arg0)
    branches = [a.strip() for a in args]
    if fn == "#if":
        if arg0:
            return branches[0] if branches else ""
        return branches[1] if len(branches) > 1 else ""
    if fn == "#ifeq":
        if len(branches) < 1:
            return ""
        eq = arg0 == branches[0]
        if eq:
            return branches[1] if len(branches) > 1 else ""
        return branches[2] if len(branches) > 2 else ""
    if fn == "#switch":
        # in-order walk with bare-case fallthrough: a bare entry whose
        # trimmed text equals the key matches and takes the value of
        # the NEXT ``= value`` entry; only a trailing bare entry is the
        # default (earlier bare entries are case names, never defaults)
        default: str | None = None
        matched = False
        last = len(args) - 1
        for i, a in enumerate(args):
            eq = _arg_eq_split(a)
            if eq >= 0:
                k = a[:eq].strip()
                v = a[eq + 1:].strip()
                if matched or k == arg0:
                    return v
                if k == "#default":
                    default = v
            else:
                bare = a.strip()
                if bare == arg0:
                    matched = True
                elif i == last and not matched:
                    default = bare
        return default if default is not None else ""
    if fn == "#ifexist":
        # No page table is visible at parse time: extraction is a
        # streaming per-page map, and consulting the global title set
        # would force a join before extraction. The reference's bliki
        # WikiModel has no page store either and answers "does not
        # exist" (its default Model), so the ELSE branch is the
        # deterministic, parity-correct result.
        return branches[1] if len(branches) > 1 else ""
    if fn == "#time":
        # deterministic subset only: an EXPLICIT timestamp argument.
        # {{#time: fmt}} means "now" — nondeterministic, stays
        # unsupported (None -> stripped).
        return _eval_time(arg0, branches[0] if branches else "")
    return None


def _eval_time(fmt: str, ts: str) -> str | None:
    """``{{#time: format | timestamp}}`` over an explicit timestamp:
    ISO ``YYYY-MM-DD [HH:MM:SS]`` or MediaWiki's 14-digit
    ``YYYYMMDDHHMMSS``. Format codes: Y y n m j d H G i s,
    ``"literal"`` quoting and ``\\x`` escapes. Any other alpha code
    (locale/era/week forms), a missing/unparseable timestamp, or an
    unclosed quote returns None — the whole invocation stays
    unsupported residue, exactly like ``#expr`` on floats."""
    ts = ts.strip()
    if not ts:
        return None
    import datetime

    dt = None
    for pat in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d", "%Y%m%d%H%M%S"):
        try:
            dt = datetime.datetime.strptime(ts, pat)
            break
        except ValueError:
            continue
    if dt is None:
        return None
    codes = {"Y": "%04d" % dt.year, "y": "%02d" % (dt.year % 100),
             "n": str(dt.month), "m": "%02d" % dt.month,
             "j": str(dt.day), "d": "%02d" % dt.day,
             "H": "%02d" % dt.hour, "G": str(dt.hour),
             "i": "%02d" % dt.minute, "s": "%02d" % dt.second}
    out: list[str] = []
    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c == '"':
            j = fmt.find('"', i + 1)
            if j < 0:
                return None
            out.append(fmt[i + 1:j])
            i = j + 1
            continue
        if c == "\\" and i + 1 < len(fmt):
            out.append(fmt[i + 1])
            i += 2
            continue
        if c in codes:
            out.append(codes[c])
        elif c.isalpha():
            return None
        else:
            out.append(c)
        i += 1
    return "".join(out)


_EXPR_TOKEN_RE = re.compile(r"\s*(\d+|[()+\-*]|div|mod|round)\s*")


def _eval_int_expr(src: str) -> str | None:
    """Integer-only ``{{#expr:}}`` evaluator: ``+ - * div mod round``,
    parentheses, unary minus (precedence: unary > ``*``/``div``/``mod``
    > ``+``/``-`` > ``round``, matching MediaWiki's table restricted to
    integers). Any other token — floats, ``/``, comparisons, ``e`` —
    returns None so the invocation stays in the text and strip_markup
    drops it (the documented unsupported-function path). ``x round n``
    with n >= 0 is the identity on integers; n < 0 rounds to a power of
    ten, half away from zero like MediaWiki."""
    tokens: list[str] = []
    pos = 0
    while pos < len(src):
        m = _EXPR_TOKEN_RE.match(src, pos)
        if m is None:
            return None  # unsupported token (float, '/', comparison, ...)
        tokens.append(m.group(1))
        pos = m.end()
    if not tokens:
        return None
    it = {"i": 0}

    def peek() -> str | None:
        return tokens[it["i"]] if it["i"] < len(tokens) else None

    def take() -> str:
        t = tokens[it["i"]]
        it["i"] += 1
        return t

    def primary() -> int | None:
        t = peek()
        if t is None:
            return None
        if t == "-":
            take()
            v = primary()
            return None if v is None else -v
        if t == "+":
            take()
            return primary()
        if t == "(":
            take()
            v = rounded()
            if v is None or peek() != ")":
                return None
            take()
            return v
        if t.isdigit():
            take()
            return int(t)
        return None

    def term() -> int | None:
        v = primary()
        if v is None:
            return None
        while peek() in ("*", "div", "mod"):
            op = take()
            r = primary()
            if r is None:
                return None
            if op == "*":
                v = v * r
            elif r == 0:
                return None  # division by zero -> unsupported residue
            elif op == "div":
                # MediaWiki div is real division; integer-exact only
                if v % r != 0:
                    return None
                v = v // r
            else:
                # MediaWiki mod is C-style (truncated), not Python floor
                v = int(math.fmod(v, r))
        return v

    def addsub() -> int | None:
        v = term()
        if v is None:
            return None
        while peek() in ("+", "-"):
            op = take()
            r = term()
            if r is None:
                return None
            v = v + r if op == "+" else v - r
        return v

    def rounded() -> int | None:
        v = addsub()
        if v is None:
            return None
        while peek() == "round":
            take()
            r = addsub()
            if r is None:
                return None
            if r < 0:
                p = 10 ** (-r)
                # half away from zero, like MediaWiki round
                sign = -1 if v < 0 else 1
                v = sign * ((abs(v) + p // 2) // p) * p
            # r >= 0: identity on integers
        return v

    out = rounded()
    if out is None or it["i"] != len(tokens):
        return None
    return str(out)


def expand_templates(text: str, lookup, max_depth: int = 8,
                     max_size: int = 1_000_000,
                     page_title: str | None = None) -> str:
    """Expand ``{{Name|args}}`` transclusions innermost-first.

    ``lookup(name)`` returns the body of ``Template:<name>`` or None for
    an unknown template (left in place; ``strip_markup`` removes it so an
    unknown template contributes no links — same net effect as before
    expansion existed). Parity target: the reference parses with bliki,
    whose ``WikiModel`` expands templates before the link walk
    (WikiProcessor.kt:45-46) — links written inside transcluded bodies
    are real links.

    Guards (MediaWiki-like, frozen here): ``max_depth`` expansion rounds
    (self-/mutual recursion bottoms out and the residue is stripped) and
    ``max_size`` output chars (a billion-laughs chain stops expanding
    and the residue is stripped)."""
    if "{{" not in text:
        return text
    for _ in range(max_depth):
        if len(text) > max_size:
            break
        out: list[str] = []
        pos = 0
        changed = False
        for m in _INNER_TPL_RE.finditer(text):
            inner = m.group(1)
            if inner.startswith("{"):  # parameter placeholder, not ours
                continue
            parts = _split_pipes(inner)
            raw_name, raw_args = parts[0], parts[1:]
            # parser functions / magic words evaluate inline (innermost
            # -first, so nested functions resolve across rounds); they
            # get the RAW pipe-split args — only #switch reads 'k=v'
            val = eval_parser_function(raw_name, raw_args, page_title)
            if val is None:
                name = normalize_template_name(raw_name)
                body = lookup(name) if name is not None else None
                if body is None:
                    continue  # unknown: leave for strip_markup
                positional, named = _classify_args(raw_args)
                val = _substitute_params(body, positional, named)
            out.append(text[pos:m.start()])
            out.append(val)
            pos = m.end()
            changed = True
        if not changed:
            break
        out.append(text[pos:])
        text = "".join(out)
        if "{{" not in text:
            break
    return text


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


def parse_wikitext(text: str, template_lookup=None,
                   page_title: str | None = None
                   ) -> tuple[bool, str | None, list[str]]:
    """Parse one page body.

    Returns ``(is_redirect, redirect_target, links)`` where ``links`` is
    the ordered, deduped, capitalized list of link targets (for a
    redirect page: the single redirect target, mirroring
    WikiProcessor.kt:49-51 where a redirect's only out-edge is its
    target).

    With ``template_lookup`` set, ``{{Name|args}}`` transclusions are
    expanded first (bliki parity: WikiProcessor.kt:45-46 parses with a
    WikiModel that expands templates before the link walk), so links
    written inside transcluded bodies are emitted; unknown templates
    still strip to nothing. The same expansion pass evaluates the
    parser-function/magic-word subset (``#if``/``#ifeq``/``#switch``,
    case functions, ``PAGENAME`` via ``page_title``) — see
    :func:`eval_parser_function`.
    """
    m = _REDIRECT_RE.match(text)
    if m:
        target = normalize_link_target(m.group(1))
        return True, target, ([target] if target is not None else [])
    if template_lookup is not None and "{{" in text:
        text = expand_templates(text, template_lookup,
                                page_title=page_title)
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


def link_anchor_pairs(text: str) -> list[tuple[str, str]]:
    """Per-OCCURRENCE ``(target, anchor)`` pairs of an article page's
    links, document order, no dedup — the per-page kernel of anchor-text
    aggregation (the classic web-link-graph feature: what the web *calls*
    a page).

    Frozen semantics (mirrored exactly by the ``wiki_anchors`` SQL
    oracle twin, pipelines/flagship.py):

    - redirect pages contribute NO anchor occurrences (their single
      ``#REDIRECT [[T]]`` link is navigation, not an endorsement);
    - target: same normalization as the link walk
      (:func:`normalize_link_target` — strip ``|anchor``/``#section``,
      underscores→spaces, capitalize first); ``None`` targets drop;
    - anchor: the inner text after the FIRST pipe, whitespace-stripped;
      a pipe-less ``[[Target]]`` renders its inner text as written, so
      the anchor defaults to the raw inner (stripped) — including any
      ``#Section`` part and the original (possibly lowercase) first
      letter, exactly what MediaWiki displays;
    - markup stripping and nested-link handling are shared with
      :func:`parse_wikitext` (same fast path / bracket-scanner
      fallback); for a nesting OUTER link the as-written anchor keeps
      the nested markup verbatim.
    """
    if _REDIRECT_RE.match(text):
        return []
    if _MARKUP_TRIGGER_RE.search(text):
        text = strip_markup(text)
    raws = _LINK_RE.findall(text)
    if any("[[" in r for r in raws):
        raws = list(iter_link_inners(text))
    out: list[tuple[str, str]] = []
    for raw in raws:
        target = normalize_link_target(_target_head(raw))
        if target is None:
            continue
        head, sep, rest = raw.partition("|")
        out.append((target, (rest if sep else raw).strip()))
    return out


def extracted_text_bytes(is_redirect: bool, redirect_target: str | None,
                         links: list[str]) -> bytes:
    """Canonical byte serialization of a page's extraction result.

    This is the payload the "byte-identical extracted text per url"
    invariant is asserted on (golden fixtures + differential tests).
    """
    if is_redirect:
        return b"#REDIRECT\t" + (redirect_target or "").encode("utf-8")
    return b"\n".join(l.encode("utf-8") for l in links)
