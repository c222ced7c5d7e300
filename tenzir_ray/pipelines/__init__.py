from tenzir_ray.pipelines.pipeline import (
    OPERATORS,
    Pipeline,
    optimize_steps,
    register,
    show,
)
from tenzir_ray.pipelines.schedule import cron, every
from tenzir_ray.pipelines.serve import HttpServer, Server, serve
from tenzir_ray.pipelines.tql import parse_pipeline, run_pipeline

__all__ = ["Pipeline", "OPERATORS", "register", "show", "optimize_steps",
           "every", "cron", "Server", "HttpServer", "serve",
           "parse_pipeline", "run_pipeline"]
