from tenzir_ray.pipelines.pipeline import OPERATORS, Pipeline

__all__ = ["Pipeline", "OPERATORS"]
