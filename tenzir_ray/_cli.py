"""Shared driver bootstrap for the CLI entry points (``python -m
tenzir_ray`` and ``python -m tenzir_ray.replay``). Library code never
initializes Ray — only entry points own a session."""

from __future__ import annotations


def init_ray(num_cpus: int | None = None) -> None:
    import ray

    if not ray.is_initialized():
        kw = {"include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus:
            kw["num_cpus"] = num_cpus
        ray.init(**kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
