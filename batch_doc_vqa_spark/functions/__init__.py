from .html_extract import extract_html, extract_payload, ExtractResult  # noqa: F401
from .pdf_extract import extract_spdf, encode_spdf, SPDF_MAGIC  # noqa: F401
