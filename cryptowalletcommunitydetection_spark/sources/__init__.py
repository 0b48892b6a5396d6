from .edge_log import (  # noqa: F401
    EdgeLog,
    incremental_derive,
    merge_edge_deltas,
    stream_files_into_log,
)
from .files import read_files, read_wallet_pairs_csv, write_files  # noqa: F401
from .sinks import quarantine_sink, write_groups  # noqa: F401
from .enrich import batched_enrich  # noqa: F401
