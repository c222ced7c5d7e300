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
    parse_gelf,
    parse_grok,
    parse_kv,
    parse_leef,
    parse_ndjson,
    parse_suricata,
    parse_syslog,
    parse_yaml_docs,
    parse_zeek_json,
)
from tenzir_ray.sources.readers import follow_lines
from tenzir_ray.sources.writers import (
    read_bitz,
    read_parquet_partitioned,
    write_bitz,
    write_csv,
    write_feather,
    write_json,
    write_parquet,
    write_parquet_partitioned,
    write_ssv,
    write_tsv,
)

__all__ = [
    "read_parquet", "read_csv", "read_json", "read_lines", "read_feather",
    "read_bitz", "follow_lines",
    "parse_ndjson", "parse_kv", "parse_syslog", "parse_cef", "parse_leef",
    "parse_grok", "parse_gelf", "parse_suricata", "parse_zeek_json",
    "parse_yaml_docs",
    "write_parquet", "write_csv", "write_tsv", "write_ssv", "write_json",
    "write_feather", "write_bitz",
    "write_parquet_partitioned", "read_parquet_partitioned",
]
