from tenzir_ray.pipelines.pipeline import OPERATORS, Pipeline, register, show
from tenzir_ray.pipelines.schedule import cron, every
from tenzir_ray.pipelines.serve import HttpServer, Server, serve

__all__ = ["Pipeline", "OPERATORS", "register", "show", "every", "cron",
           "Server", "HttpServer", "serve"]
