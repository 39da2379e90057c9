from dliom_tpu.sensor.types import (
    ImuData,
    OdometryData,
    TimedPointCloud,
    RangeData,
    pad_point_cloud,
)

__all__ = [
    "ImuData",
    "OdometryData",
    "TimedPointCloud",
    "RangeData",
    "pad_point_cloud",
]
