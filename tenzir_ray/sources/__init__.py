"""Sources & formats: bytes ↔ events (reference §2.1/§2.2).

Native Ray Data readers cover file/parquet/csv/json/text; the parser
family here turns line-oriented text Datasets into typed event Datasets
via vectorized ``map_batches`` stages (the reference's parser plugins,
libtenzir/builtins/formats/*.cpp).
"""

from tenzir_ray.sources.readers import (
    read_csv,
    read_feather,
    read_json,
    read_lines,
    read_parquet,
)
from tenzir_ray.sources.parsers import (
    parse_cef,
    parse_grok,
    parse_kv,
    parse_leef,
    parse_ndjson,
    parse_syslog,
)

__all__ = [
    "read_parquet", "read_csv", "read_json", "read_lines", "read_feather",
    "parse_ndjson", "parse_kv", "parse_syslog", "parse_cef", "parse_leef",
    "parse_grok",
]
