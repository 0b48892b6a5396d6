from .relational import (  # noqa: F401
    anti_join,
    distinct_senders,
    group_set_union,
    merge_upsert,
    native_transfer_filter,
    recency_filter,
    semi_join,
    top1_per_key,
    tumbling_slices,
)
