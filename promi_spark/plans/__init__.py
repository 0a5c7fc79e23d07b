from promi_spark.plans.pipeline import Flow, FlowResult, execute, load_flow
from promi_spark.plans.registry import REGISTRY, FlowContext, OpEntry, get, register

__all__ = [
    "Flow",
    "FlowResult",
    "execute",
    "load_flow",
    "REGISTRY",
    "FlowContext",
    "OpEntry",
    "get",
    "register",
]
