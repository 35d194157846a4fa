from .extract import LinkExtractor, extract_pages_meta  # noqa: F401
from .ids import assign_dense_ids  # noqa: F401
