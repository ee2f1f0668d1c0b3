from .fold import lww_last_per_key  # noqa: F401
from .partition import add_partition_column, stable_hash_strings  # noqa: F401
