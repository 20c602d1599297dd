from walt_tpu.index.build import HashTable, build_table, build_all_tables  # noqa: F401
from walt_tpu.index import io_walt  # noqa: F401
