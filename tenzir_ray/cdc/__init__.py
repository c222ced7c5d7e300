"""CDC / incremental-ingest core: binlog tail → exactly-once lake upsert."""

from tenzir_ray.cdc.generate import gen_changes, gen_transcripts
from tenzir_ray.cdc.oracle import naive_apply
from tenzir_ray.cdc.lake import LakeTable
from tenzir_ray.cdc.replicate import replicate_stream
from tenzir_ray.cdc.derived import DerivedView
from tenzir_ray.cdc.quality import quarantine_changes, read_quarantine

__all__ = ["gen_changes", "gen_transcripts", "naive_apply", "LakeTable",
           "replicate_stream", "DerivedView", "quarantine_changes",
           "read_quarantine"]
