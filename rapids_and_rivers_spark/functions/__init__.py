"""Expression library: typed JSON access, predicates, envelope, temporal.

Everything here returns Catalyst ``Column`` expressions — JVM-side,
whole-stage-codegen friendly. No Python UDFs on these paths.
"""

from rapids_and_rivers_spark.functions import json_ops, predicates, envelope, temporal

__all__ = ["json_ops", "predicates", "envelope", "temporal"]
