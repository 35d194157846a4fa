from .corpus import (  # noqa: F401
    generate_pages_table,
    write_pages_corpus,
    page_url,
    title_from_url,
)
