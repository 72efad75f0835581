from .scalars import (  # noqa: F401
    basename,
    date_spine,
    hive_partition_value,
    parse_url_col,
    row_content_hash,
)
