from dliom_tpu.metrics.metrics import (
    Counter,
    FamilyFactory,
    Gauge,
    Histogram,
    global_registry,
    register_all_metrics,
)

__all__ = [
    "Counter",
    "Gauge",
    "Histogram",
    "FamilyFactory",
    "global_registry",
    "register_all_metrics",
]
