"""Distributed mapping service (cloud/ analog).

Counterpart of the reference's gRPC `MapBuilderServer` + `MapBuilderStub`
(cloud/internal/map_builder_server.{h,cc}, cloud/client/map_builder_stub.cc):
a robot-side frontend streams sensor data to a mapping server that owns the
MapBuilder; a dedicated SLAM thread drains a blocking queue in arrival order
(`ProcessSensorDataQueue`, map_builder_server.cc:142-153); queries read the
pose graph. Wire protocol is length-prefixed msgpack over TCP instead of
async_grpc/protobuf — same handler surface, no codegen.
"""

from dliom_tpu.cloud.server import MapBuilderServer
from dliom_tpu.cloud.client import MapBuilderStub
from dliom_tpu.cloud.uploader import LocalTrajectoryUploader

__all__ = ["MapBuilderServer", "MapBuilderStub", "LocalTrajectoryUploader"]
