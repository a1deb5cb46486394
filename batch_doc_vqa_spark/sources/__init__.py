from .pages import page_row, pages_df, PAGES_SCHEMA, rows_for_sf  # noqa: F401
from .glob_scan import glob_scan, natural_sort_key  # noqa: F401
from .jsonl import read_pages_jsonl, write_pages_jsonl  # noqa: F401
