from . import analytics, dedup, matching, similarity, textstats  # noqa: F401
