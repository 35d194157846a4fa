from .corpus import (  # noqa: F401
    generate_pages_table,
    write_pages_corpus,
    page_url,
    title_from_url,
)
from .xml_dump import (  # noqa: F401
    multistream_ranges,
    read_multistream_dump,
    read_xml_dump,
)
