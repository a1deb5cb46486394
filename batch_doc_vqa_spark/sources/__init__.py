from .pages import page_row, pages_df, PAGES_SCHEMA, rows_for_sf  # noqa: F401
