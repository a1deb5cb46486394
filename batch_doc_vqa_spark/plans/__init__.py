from .skew import with_salted_partition, salted_host_stats  # noqa: F401
from .extract_job import run_extraction, read_results, read_lineage, config_fingerprint  # noqa: F401
from .publish import publish_run, publish_reject_reason, read_published, read_quarantine, committed_publish_ids  # noqa: F401
from .sweep import parse_sweep_axis, build_sweep_axes, build_condition_grid, condition_grid_df, run_sweep  # noqa: F401
