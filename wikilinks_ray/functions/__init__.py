from .wikitext import (  # noqa: F401
    capitalize_first,
    normalize_link_target,
    parse_wikitext,
    extracted_text_bytes,
)
