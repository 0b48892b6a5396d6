from .scalar import (  # noqa: F401
    composite_key,
    content_sha256,
    deterministic_id,
    normalize_address,
    parse_datestr_unix,
    parse_human_amount,
    parse_percentage,
    regexp_allowlist,
    snake_to_camel,
    split_composite_key,
    token_value_usd,
)
from .timeseries import (  # noqa: F401
    asof_join,
    asof_last_value,
    bucket_timestamps,
    carry_forward_sum,
    keep_one_per_bucket,
    prune_old,
    sessionize,
    sessionize_stream,
)
