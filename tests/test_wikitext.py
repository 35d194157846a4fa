"""Unit tests of the frozen extraction semantics (functions/wikitext.py).

Pins the per-page contract mirrored from the reference
(WikiProcessor.kt:43-71,114-121; WikiProcessorTest.kt:31-51).
"""

from wikilinks_ray.functions.wikitext import (
    capitalize_first,
    extracted_text_bytes,
    normalize_link_target,
    parse_wikitext,
)


def test_capitalize_first_letter_only():
    # possiblyCapitalize semantics (WikiProcessor.kt:114-121)
    assert capitalize_first("polska") == "Polska"
    assert capitalize_first("Polska") == "Polska"
    assert capitalize_first("éclair") == "Éclair"
    assert capitalize_first("ĝdansk lower rest UPPER") == "Ĝdansk lower rest UPPER"
    assert capitalize_first("") == ""
    assert capitalize_first("123abc") == "123abc"  # digit: isupper() False but upper() no-op


def test_normalize_link_target():
    assert normalize_link_target("foo") == "Foo"
    assert normalize_link_target("Foo|anchor text") == "Foo"
    assert normalize_link_target("Foo#Section") == "Foo"
    assert normalize_link_target("Foo_bar baz") == "Foo bar baz"
    assert normalize_link_target("  spaced  ") == "Spaced"
    assert normalize_link_target("") is None
    assert normalize_link_target("#OnlyAnchor") is None
    assert normalize_link_target("|only anchor") is None


def test_parse_article_dedup_preserves_first_occurrence_order():
    # .distinct() keeps encounter order (WikiProcessor.kt:55)
    text = "x [[b]] y [[A]] z [[B]] w [[a|anchor]] [[C#sec]]"
    is_r, tgt, links = parse_wikitext(text)
    assert not is_r and tgt is None
    assert links == ["B", "A", "C"]


def test_parse_redirect_variants():
    for t in (
        "#REDIRECT [[Target Page]]",
        "#redirect [[Target Page]]",
        "  #Redirect: [[target Page]]",
    ):
        is_r, tgt, links = parse_wikitext(t)
        assert is_r and tgt == "Target Page" and links == ["Target Page"]


def test_redirect_only_at_start():
    is_r, _, links = parse_wikitext("Not a redirect. #REDIRECT [[X]]")
    assert not is_r
    assert links == ["X"]


def test_extracted_text_bytes_canonical():
    assert extracted_text_bytes(False, None, ["A", "Bé"]) == b"A\nB\xc3\xa9"
    assert extracted_text_bytes(True, "Tgt", ["Tgt"]) == b"#REDIRECT\tTgt"
    assert extracted_text_bytes(False, None, []) == b""


def test_markup_stripping_robustness():
    """bliki-parity semantics: comments / nowiki / templates contribute
    no links (the reference feeds bliki's parsed links at
    WikiProcessor.kt:55, never raw regex matches)."""
    from wikilinks_ray.functions.wikitext import parse_wikitext

    text = (
        "see [[Alpha]] <!-- [[Hidden]] --> and "
        "<nowiki>[[Also Hidden]]</nowiki> "
        "{{infobox|link=[[Template Hidden]]|nested={{x|[[Deep]]}}}} "
        "then [[beta]]"
    )
    is_r, tgt, links = parse_wikitext(text)
    assert (is_r, tgt) == (False, None)
    assert links == ["Alpha", "Beta"]


def test_nested_file_link_yields_outer_and_inner():
    """[[File:x|caption [[Y]]]] links BOTH File:x (a non-main target
    that later resolves to nothing, like any null link) and Y."""
    from wikilinks_ray.functions.wikitext import parse_wikitext

    is_r, _t, links = parse_wikitext(
        "[[File:Map.png|thumb|the city of [[Gdańsk]] at night]] and [[Polska]]")
    assert not is_r
    assert links == ["File:Map.png", "Gdańsk", "Polska"]


def test_unbalanced_brackets_are_literal():
    from wikilinks_ray.functions.wikitext import parse_wikitext

    assert parse_wikitext("a [[Open and never closed")[2] == []
    assert parse_wikitext("[[Ok]] then [[broken")[2] == ["Ok"]
    # a stray opener must NOT swallow the valid links after it
    assert parse_wikitext("see [[ broken then [[Alpha]] and [[Beta]]")[2] \
        == ["Alpha", "Beta"]
    # deep pathological nesting: no recursion, innermost target survives
    deep = "[[" * 2000 + "X" + "]]" * 2000
    assert parse_wikitext(deep)[2] == ["X"]


def test_template_nesting_depth_bounded():
    from wikilinks_ray.functions.wikitext import strip_markup

    deep = "{{" * 40 + "x" + "}}" * 40 + " [[Kept]]"
    assert "[[Kept]]" in strip_markup(deep)
